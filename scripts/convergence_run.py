"""Multi-phase convergence-to-quality run (VERDICT r1 item 2).

Trains 3D pgan through phases 1->4 (4^3 -> 32^3) on structured synthetic
volumes (1-3 gaussian ellipsoid blobs on a smooth background — multi-scale
structure so SWD is meaningful), with the full reference recipe: WGAN-GP
simultaneous, EMA, mixing->stabilizing alpha fade, phase chaining via
name-intersection restore.  Logs SWD + proxy-FID (RandomConvFeatures —
explicitly uncalibrated, trajectory-comparable within the run) at each
metric pass and asserts the quality trajectory improves.

Run (real chip): python scripts/convergence_run.py [outdir] [ending_phase]
                     [starting_phase] [arch]
Writes <outdir>/trajectory.json and prints a summary.

`arch` accepts every family in the zoo (default pgan).  stylegan2 has no
progressive alpha (reference main.py:413-414), so its run is a single
phase trained from scratch at the `ending_phase` resolution; all other
families train the full growth schedule.

Exercises the one path single-phase tests don't: that the whole stack
*trains through growth* (reference README.md:33-44 releases exactly such
checkpoints).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from saragan_tpu.config import Config
from saragan_tpu.metrics.fid import RandomConvFeatures
from saragan_tpu.metrics.save_metrics import make_metrics_callback
from saragan_tpu.train.trainer import Trainer


def make_blob_volume(rng: np.random.Generator, size: int = 32) -> np.ndarray:
    """1-3 gaussian ellipsoids + smooth low-frequency background."""
    zz, yy, xx = np.meshgrid(*([np.linspace(-1, 1, size)] * 3), indexing="ij")
    vol = np.zeros((size, size, size), np.float32)
    for _ in range(rng.integers(1, 4)):
        c = rng.uniform(-0.5, 0.5, 3)
        s = rng.uniform(0.12, 0.35, 3)
        a = rng.uniform(0.8, 1.6)
        vol += a * np.exp(
            -(((zz - c[0]) / s[0]) ** 2 + ((yy - c[1]) / s[1]) ** 2 + ((xx - c[2]) / s[2]) ** 2)
        )
    # low-frequency background ripple
    f = rng.uniform(0.5, 1.5, 3)
    p = rng.uniform(0, 2 * np.pi, 3)
    vol += 0.2 * np.sin(f[0] * np.pi * zz + p[0]) * np.sin(f[1] * np.pi * yy + p[1]) * np.sin(
        f[2] * np.pi * xx + p[2]
    )
    return vol.astype(np.float32)


def downsample(vol: np.ndarray, size: int) -> np.ndarray:
    factor = vol.shape[0] // size
    if factor == 1:
        return vol
    s = size
    return vol.reshape(s, factor, s, factor, s, factor).mean(axis=(1, 3, 5))


def build_dataset(root: str, n: int = 384, master: int = 32, seed: int = 0):
    rng = np.random.default_rng(seed)
    sizes = [4 * 2**i for i in range(int(np.log2(master // 4)) + 1)]
    for s in sizes:
        os.makedirs(os.path.join(root, f"{s}x{s}"), exist_ok=True)
    for i in range(n):
        vol = make_blob_volume(rng, master)
        for s in sizes:
            np.save(os.path.join(root, f"{s}x{s}", f"v{i:04d}.npy"), downsample(vol, s))
    # dataset statistics for normalization
    sample = np.stack([make_blob_volume(np.random.default_rng(10_000 + i), master)
                       for i in range(64)])
    return float(sample.mean()), float(sample.std())


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/convergence_run"
    ending_phase = int(sys.argv[2]) if len(sys.argv) > 2 else 4  # 4 -> 32³, 5 -> 64³
    # optional starting phase: resume mid-schedule by chaining from the
    # model_{N-1}.npz already in <outdir>/logs (one process per phase also
    # sidesteps the relay's per-transfer host-buffer accumulation at 128³)
    starting_phase = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    arch = sys.argv[4] if len(sys.argv) > 4 else "pgan"
    # CONVERGENCE_SMOKE=1: tiny budgets for a CPU wiring check (the
    # convergence assertions are skipped — toy budgets can't converge)
    smoke = bool(int(os.environ.get("CONVERGENCE_SMOKE", "0")))
    if arch == "stylegan2":
        # no progressive alpha (Config.finalize asserts single-phase):
        # train one phase from scratch at the target resolution
        starting_phase = ending_phase
    master = 4 * 2 ** (ending_phase - 1)
    dataroot = os.path.join(outdir, "data")
    os.makedirs(outdir, exist_ok=True)
    if os.path.isdir(os.path.join(dataroot, f"{master}x{master}")):
        print("Reusing existing blob pyramid", flush=True)
        sample = np.stack([make_blob_volume(np.random.default_rng(10_000 + i), master)
                           for i in range(64)])
        mean, std = float(sample.mean()), float(sample.std())
    else:
        print(f"Building synthetic blob pyramid (master {master}³) ...", flush=True)
        mean, std = build_dataset(dataroot, master=master)
    print(f"data mean {mean:.4f} std {std:.4f}", flush=True)

    cfg = Config(
        architecture=arch,
        dataset_path=dataroot,
        start_shape="(1, 4, 4, 4)",
        # phases 1..ending_phase -> 4..master (num_phases = log2(final/start),
        # reference utils.py:211-217; final-shape convention is one above master)
        final_shape=f"(1, {2 * master}, {2 * master}, {2 * master})",
        starting_phase=starting_phase,
        ending_phase=ending_phase,
        # resuming mid-schedule: chain from the previous phase's checkpoint
        # (phase chaining only auto-restores for phase > starting_phase)
        continue_path=(os.path.join(outdir, "logs", f"model_{starting_phase - 1}")
                       if starting_phase > 1 and arch != "stylegan2" else None),
        latent_dim=64,
        network_size="xs",
        base_batch_size=64,
        max_global_batch_size=64,
        mixing_nimg=64 if smoke else 4096,
        stabilizing_nimg=128 if smoke else 8192,
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        adam_beta1=0.0,
        adam_beta2=0.9,
        g_lr=7.5e-4,
        d_lr=7.5e-4,
        ema_beta=0.99,
        data_mean=mean,
        data_stddev=std,
        calc_metrics=True,
        compute_FID=True,
        compute_swds=True,
        compute_mses=True,
        num_metric_samples=8 if smoke else 32,
        metrics_batch_size=8 if smoke else 32,
        metrics_every_nsteps=64 if smoke else 6144,
        summary_small_every_nsteps=2048,
        grad_histograms=False,
        summary_large_every_nsteps=10**9,
        checkpoint_every_nsteps=10**9,
        compute_dtype="bfloat16",
        transfer_dtype="auto",  # -> bfloat16 under bf16 compute: bit-exact,
        # halves per-step relay transfer and its host-buffer leak (BASELINE.md)
        fused_transitions=True,
        logdir=os.path.join(outdir, "logs"),
    ).finalize()

    trajectory = []
    extractor = RandomConvFeatures(seed=7)  # proxy FID: run-internal trajectory only
    base_cb = make_metrics_callback(cfg, extractor=extractor)

    def recording_cb(trainer, sampler, dataset, step, suffix):
        m = base_cb(trainer, sampler, dataset, step, suffix)
        entry = {"phase": trainer.phase, "step": int(step), "suffix": suffix,
                 "time": time.time()}
        for k, v in (m or {}).items():
            entry[k] = np.asarray(v).tolist() if hasattr(v, "tolist") else float(v)
        trajectory.append(entry)
        print("METRIC", json.dumps(entry), flush=True)
        return m

    recording_cb.fid_calibrated = False

    t0 = time.time()
    trainer = Trainer(cfg, metrics_callback=recording_cb, verbose=True, prefetch=True)
    trainer.run()
    wall = time.time() - t0

    with open(os.path.join(outdir, "trajectory.json"), "w") as f:
        json.dump({"trajectory": trajectory, "wall_s": wall}, f, indent=1)

    # --- quality trajectory assertions -------------------------------
    # proxy-FID on the validation stream within each phase must improve
    # from the phase's first measurement to its EMA end-of-phase value,
    # and the final phase-4 EMA FID must be well below its first reading.
    per_phase_first = {}
    per_phase_last_ema = {}
    for e in trajectory:
        if "FID" not in e:
            continue
        ph = e["phase"]
        if e["suffix"] == "" and ph not in per_phase_first:
            per_phase_first[ph] = e["FID"]
        if e["suffix"] in ("_EMA", "_validation"):
            per_phase_last_ema[ph] = e["FID"]
    print("first FID per phase:", per_phase_first)
    print("last EMA/val FID per phase:", per_phase_last_ema)
    if smoke:
        assert per_phase_last_ema and all(
            np.isfinite(v) for v in per_phase_last_ema.values()
        )
        print(f"CONVERGENCE SMOKE OK ({arch}; no convergence assertions on a toy budget)")
        return
    final_phase = max(per_phase_last_ema)
    assert per_phase_last_ema[final_phase] < per_phase_first[final_phase], (
        "final phase did not improve over its first measurement"
    )
    improved = sum(
        1 for ph in per_phase_first
        if ph in per_phase_last_ema and per_phase_last_ema[ph] < per_phase_first[ph]
    )
    n_phases = len(per_phase_first)
    print(f"phases improved: {improved}/{n_phases}; wall {wall:.0f}s")
    # Band-based gate (round 4, BASELINE.md "Seed-variance band" — the
    # 3-seed flagship band measured small-noise regressions up to +4%
    # and one bounded fade-disruption mode with recovery; round-3's n-1
    # gate allowed a single regression of ANY size).  Same rule as
    # convergence_run_flagship.py.
    NOISE_TOL = 0.05
    REGRESSION_CAP = 1.0
    total_rel = 0.0
    for ph, first in per_phase_first.items():
        last = per_phase_last_ema.get(ph)
        if last is None:
            continue
        rel = (last - first) / abs(first)
        total_rel += rel
        if last < first:
            continue
        readings = [e["FID"] for e in trajectory
                    if e.get("suffix") == "" and e["phase"] == ph]
        in_phase = readings[1:]
        print(f"phase {ph} regressed {first:.2f} -> {last:.2f} "
              f"(rel {rel:+.2f}); in-phase readings {in_phase}")
        if rel <= NOISE_TOL:
            continue
        assert rel <= REGRESSION_CAP, (
            f"phase {ph} regression {rel:+.2f} exceeds the measured seed band")
        assert in_phase and last < min(in_phase), (
            f"phase {ph} regressed with NO fade recovery")
    assert improved >= (n_phases + 1) // 2, (
        f"only {improved}/{n_phases} phases improved — not converging")
    assert total_rel < 0, (
        f"aggregate relative change {total_rel:+.2f} — the run did not improve")
    print("CONVERGENCE OK")


if __name__ == "__main__":
    main()
