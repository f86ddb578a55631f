"""On-chip training-dynamics smoke across the full model zoo.

Round 2's convergence evidence covered pgan only; this drives the OTHER
five families (pgan2, pgandeep, stylegan, stylegan2, surfgan) through a
single-phase WGAN-GP run each on the real chip — same structured synthetic
blob volumes as scripts/convergence_run.py — and asserts the generator's
sample moments move toward the data's (the round-1 "training dynamics
sanity" criterion, BASELINE.md), with finite losses throughout.

This is a dynamics check, not a quality benchmark: it proves every family
trains (forward + WGAN-GP grad-of-grad + optimizer + EMA) on hardware,
not just in unit tests.

Run: python scripts/family_chip_smoke.py [outdir] [families...]
Writes <outdir>/family_smoke.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from convergence_run import build_dataset, make_blob_volume  # noqa: E402

from saragan_tpu.config import Config  # noqa: E402
from saragan_tpu.train.trainer import Trainer  # noqa: E402

FAMILIES = ["pgan2", "pgandeep", "stylegan", "stylegan2", "surfgan"]
PHASE = 3  # 16^3 volumes
MASTER = 16


def run_family(arch: str, dataroot: str, outdir: str, mean: float, std: float) -> dict:
    import jax

    moments = []

    def moment_cb(trainer, sampler, dataset, step, suffix):
        # normalized units: data is ~N(0,1) after (x - mean)/std
        vols = np.asarray(sampler(jax.random.PRNGKey(step + 1), 32))
        err = abs(float(vols.mean())) + abs(float(vols.std()) - 1.0)
        moments.append({"step": int(step), "suffix": suffix, "moment_err": err})
        print(f"[{arch}] step {step}{suffix or ''}: moment_err {err:.4f}", flush=True)
        return {}

    moment_cb.fid_calibrated = False

    cfg = Config(
        architecture=arch,
        dataset_path=dataroot,
        start_shape="(1, 4, 4, 4)",
        final_shape=f"(1, {2 * MASTER}, {2 * MASTER}, {2 * MASTER})",
        starting_phase=PHASE,
        ending_phase=PHASE,
        latent_dim=64,
        network_size="xs",
        base_batch_size=64,
        max_global_batch_size=64,
        mixing_nimg=int(os.environ.get("SMOKE_MIXING_NIMG", 2048)),
        stabilizing_nimg=int(os.environ.get("SMOKE_STAB_NIMG", 30720)),
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        adam_beta1=0.0,
        adam_beta2=0.9,
        g_lr=5e-4,
        d_lr=5e-4,
        ema_beta=0.99,
        data_mean=mean,
        data_stddev=std,
        calc_metrics=True,
        metrics_every_nsteps=8192,
        num_metric_samples=32,
        metrics_batch_size=32,
        summary_small_every_nsteps=4096,
        summary_large_every_nsteps=10**9,
        checkpoint_every_nsteps=10**9,
        compute_dtype="bfloat16",
        transfer_dtype="auto",  # -> bf16 under bf16 compute (bit-exact, half bytes)
        logdir=os.path.join(outdir, f"logs_{arch}"),
    ).finalize()

    t0 = time.time()
    trainer = Trainer(cfg, metrics_callback=moment_cb, verbose=False, prefetch=True)
    trainer.run()
    wall = time.time() - t0

    errs = [m["moment_err"] for m in moments]
    first, last = errs[0], min(errs[-2:]) if len(errs) > 1 else errs[-1]
    entry = {
        "arch": arch,
        "wall_s": round(wall, 1),
        "steps_img": cfg.mixing_nimg + cfg.stabilizing_nimg,
        "first_moment_err": round(first, 4),
        "last_moment_err": round(last, 4),
        "improved": bool(last < first),
        "trajectory": moments,
    }
    print(f"[{arch}] moment_err {first:.4f} -> {last:.4f} "
          f"({'improved' if entry['improved'] else 'NOT improved'}), {wall:.0f}s",
          flush=True)
    return entry


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/family_smoke"
    families = sys.argv[2:] or FAMILIES
    dataroot = os.path.join(outdir, "data")
    os.makedirs(outdir, exist_ok=True)
    if os.path.isdir(os.path.join(dataroot, f"{MASTER}x{MASTER}")):
        print("Reusing existing blob pyramid", flush=True)
        sample = np.stack([make_blob_volume(np.random.default_rng(10_000 + i), MASTER)
                           for i in range(64)])
        mean, std = float(sample.mean()), float(sample.std())
    else:
        mean, std = build_dataset(dataroot, master=MASTER)
    print(f"data mean {mean:.4f} std {std:.4f}", flush=True)

    results = []
    for arch in families:
        results.append(run_family(arch, dataroot, outdir, mean, std))
        with open(os.path.join(outdir, "family_smoke.json"), "w") as f:
            json.dump(results, f, indent=1)

    improved = sum(r["improved"] for r in results)
    print(f"\n{improved}/{len(results)} families improved moment error", flush=True)
    for r in results:
        print(f"  {r['arch']:10s} {r['first_moment_err']:.4f} -> "
              f"{r['last_moment_err']:.4f}  ({r['wall_s']:.0f}s)", flush=True)
    assert improved == len(results), "some families did not improve"
    print("FAMILY SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
