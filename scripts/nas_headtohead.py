"""NAS head-to-head across seeds (VERDICT r3 item 6).

Round 3's claim "the architectural axis dominates" rode on 8 random NAS
samples at one seed: the NAS-best architecture scored 17.07 while every
fixed-architecture sweep on the identical objective scored >=32.19.  This
script makes (or breaks) that claim load-bearing: train the NAS-best
architecture and the default 'xs' architecture HEAD-TO-HEAD — identical
data, pinned LRs (the NAS sweep's 0.0545/0.0141), identical budgets —
across several training seeds, and report the per-seed gap.

NAS-best = trial 1 of docs/evidence/nas_sweep_r3c_trials.txt:
  filters [[4, 8], [8, 8], [64, 64]]   (exponents 2,3 / 3,3 / 6,6)
  kernels [[-, 1^3], [3^3, 7^3], [3^3, 7^3]]
'xs' default = network_size="xs" table sizing with 3^3 kernels
(ops/core.py num_filters; the arch every LR sweep used).

Objective: identical to scripts/hpo_chip_demo.py — pgan phases 1->3
(4^3 -> 16^3) on the structured blob pyramid, end-of-phase-3 validation
proxy-FID (run-internal RandomConvFeatures; comparable within this run).

Run (real chip, serialized):  python scripts/nas_headtohead.py [outdir] [seeds...]
Writes <outdir>/headtohead.json; prints the per-seed table + verdict.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from convergence_run import build_dataset  # noqa: E402

from saragan_tpu.config import Config  # noqa: E402
from saragan_tpu.hpo import harness  # noqa: E402

NAS_BEST = dict(
    kernel_spec=[
        [[], [1, 1, 1]],
        [[3, 3, 3], [7, 7, 7]],
        [[3, 3, 3], [7, 7, 7]],
    ],
    filter_spec=[[4, 8], [8, 8], [64, 64]],
)
XS_DEFAULT = dict(network_size="xs")


def run_leg(arch_kw: dict, dataroot: str, logdir: str, seed: int,
            mean: float, std: float, smoke: bool) -> float:
    cfg = Config(
        architecture="pgan",
        dataset_path=dataroot,
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 32, 32, 32)",  # phases 1-3 -> 4,8,16
        starting_phase=1,
        ending_phase=3,
        latent_dim=64,
        base_batch_size=64,
        max_global_batch_size=64,
        mixing_nimg=16 if smoke else 2048,
        stabilizing_nimg=32 if smoke else 4096,
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        adam_beta1=0.0,
        adam_beta2=0.9,
        g_lr=0.0545,
        d_lr=0.0141,
        g_lr_rise_niter=1, g_lr_decay_niter=1,
        d_lr_rise_niter=1, d_lr_decay_niter=1,
        ema_beta=0.99,
        data_mean=mean,
        data_stddev=std,
        calc_metrics=True,
        compute_FID=True,
        allow_uncalibrated_fid=True,
        num_metric_samples=8 if smoke else 32,
        metrics_batch_size=8 if smoke else 32,
        metrics_every_nsteps=10**9,
        summary_small_every_nsteps=4096,
        grad_histograms=False,
        summary_large_every_nsteps=10**9,
        checkpoint_every_nsteps=10**9,
        compute_dtype="bfloat16",
        fused_transitions=True,
        seed=seed,
        logdir=logdir,
        **arch_kw,
    )
    fid = harness.run(cfg)
    return float(fid)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nas_headtohead"
    seeds = [int(s) for s in sys.argv[2:]] or [42, 1, 2]
    smoke = bool(int(os.environ.get("HPO_DEMO_SMOKE", "0")))
    dataroot = os.path.join(outdir, "data")
    os.makedirs(outdir, exist_ok=True)
    print("Building synthetic blob pyramid (16^3 master) ...", flush=True)
    mean, std = build_dataset(dataroot, n=32 if smoke else 256, master=16)

    rows = []
    for seed in seeds:
        for name, kw in (("nas_best", NAS_BEST), ("xs_default", XS_DEFAULT)):
            t0 = time.time()
            fid = run_leg(kw, dataroot,
                          os.path.join(outdir, f"logs_{name}_s{seed}"),
                          seed, mean, std, smoke)
            rows.append({"arch": name, "seed": seed, "fid": round(fid, 3),
                         "wall_s": round(time.time() - t0, 1)})
            print("LEG", json.dumps(rows[-1]), flush=True)

    by_arch = {}
    for r in rows:
        by_arch.setdefault(r["arch"], []).append(r["fid"])
    gaps = [
        next(r["fid"] for r in rows if r["arch"] == "xs_default" and r["seed"] == s)
        - next(r["fid"] for r in rows if r["arch"] == "nas_best" and r["seed"] == s)
        for s in seeds
    ]
    summary = {
        "rows": rows,
        "nas_best_fids": by_arch.get("nas_best", []),
        "xs_default_fids": by_arch.get("xs_default", []),
        "per_seed_gap_xs_minus_nas": [round(g, 3) for g in gaps],
        "nas_wins": sum(1 for g in gaps if g > 0),
        "n_seeds": len(seeds),
    }
    with open(os.path.join(outdir, "headtohead.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY", json.dumps(summary))
    if not smoke:
        verdict = ("NAS ARCH WINS across seeds"
                   if summary["nas_wins"] == len(seeds)
                   else "NAS advantage does NOT reproduce across seeds"
                   if summary["nas_wins"] == 0
                   else "mixed: NAS wins on some seeds only")
        print("NAS HEADTOHEAD:", verdict)


if __name__ == "__main__":
    main()
