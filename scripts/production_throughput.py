"""Production-path throughput at the bench config (round-3 continuation).

bench.py measures the jitted step with a device-RESIDENT batch — the
compute ceiling.  This script measures what a USER gets from the real
production stack at the same config (pgan xs, phase 6 = 32x128x128,
batch 8, WGAN-GP bf16): `Trainer.run` end-to-end with files on disk, the
native C++ prefetch executor, normalization, `--transfer_dtype auto`
(bfloat16) host->device shipping, summaries on the reference cadence.

The input-transfer A/B (BASELINE.md) predicts: host-f32 feeding would cap
production at ~14.9 vol/s while bf16 feeding sustains ~25 — this script is
the end-to-end receipt for that prediction, measured by the trainer's own
windowed throughput (value-fetch-closed windows: relay-safe, CLAUDE.md).

Run (real chip, ~10 min incl. compile):
    python scripts/production_throughput.py [outdir] [n_steps] [phase]
`phase` defaults to 6 (the bench config); pass 3 for a CPU wiring smoke.
Prints PROD_THROUGHPUT lines and a final JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from saragan_tpu.config import Config
from saragan_tpu.train.trainer import Trainer

def phase_shape(phase: int):
    """(z, y, x) at `phase` for start_shape (1, 1, 4, 4): 6 -> 32x128x128."""
    return (2 ** (phase - 1), 4 * 2 ** (phase - 1), 4 * 2 ** (phase - 1))


def build_dataset(root: str, phase: int, n: int = 64, seed: int = 0):
    """n synthetic volumes under <root>/<y>x<x> at the phase resolution —
    smooth blobs, f32 like prepared LIDC."""
    rng = np.random.default_rng(seed)
    shape = phase_shape(phase)
    d = os.path.join(root, f"{shape[1]}x{shape[2]}")
    os.makedirs(d, exist_ok=True)
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, shape[0]), np.linspace(-1, 1, shape[1]),
        np.linspace(-1, 1, shape[2]), indexing="ij")
    for i in range(n):
        vol = np.zeros(shape, np.float32)
        for _ in range(rng.integers(1, 4)):
            c = rng.uniform(-0.5, 0.5, 3)
            s = rng.uniform(0.15, 0.4, 3)
            vol += rng.uniform(0.8, 1.6) * np.exp(
                -(((zz - c[0]) / s[0]) ** 2 + ((yy - c[1]) / s[1]) ** 2
                  + ((xx - c[2]) / s[2]) ** 2))
        np.save(os.path.join(d, f"v{i:04d}.npy"), vol.astype(np.float32))
    return 0.1, 0.5  # fixed stats: throughput, not convergence


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prod_throughput"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    phase = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    shape = phase_shape(phase)
    dataroot = os.path.join(outdir, "data")
    os.makedirs(outdir, exist_ok=True)
    if not os.path.isdir(os.path.join(dataroot, f"{shape[1]}x{shape[2]}")):
        print(f"Building synthetic {shape} dataset ...", flush=True)
        mean, std = build_dataset(dataroot, phase)
    else:
        print("Reusing dataset", flush=True)
        mean, std = 0.1, 0.5

    batch = 8
    cfg = Config(
        architecture="pgan",
        dataset_path=dataroot,
        start_shape="(1, 1, 4, 4)",
        final_shape="(1, 128, 512, 512)",  # bench flagship geometry
        starting_phase=phase,
        ending_phase=phase,
        latent_dim=256,
        network_size="xs",
        base_batch_size=batch * 2 ** (phase - 1),  # halved per phase -> 8
        mixing_nimg=n_steps // 2 * batch,
        stabilizing_nimg=n_steps // 2 * batch,
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        adam_beta1=0.0,
        adam_beta2=0.9,
        g_lr=1e-3,
        d_lr=1e-3,
        data_mean=mean,
        data_stddev=std,
        # reference summary cadence ~ every 128 imgs = 16 steps: realistic
        # production overhead, and each summary closes a throughput window
        summary_small_every_nsteps=128,
        summary_large_every_nsteps=10**9,
        metrics_every_nsteps=10**9,
        checkpoint_every_nsteps=10**9,
        grad_histograms=False,
        compute_dtype="bfloat16",
        # transfer_dtype left at the 'auto' default -> bfloat16 (the point)
        logdir=os.path.join(outdir, "logs"),
    ).finalize()
    print(f"resolved transfer_dtype: {cfg.transfer_dtype}", flush=True)

    t0 = time.time()
    trainer = Trainer(cfg, verbose=True, prefetch=True)
    trainer.run()
    wall = time.time() - t0

    # the trainer's own windowed volumes/s (windows close at summary-step
    # value fetches; the first window resets after cold compile)
    vps = float(trainer.last_img_s)
    out = {
        "metric": f"production_trainer_volumes_per_sec_phase{phase}_pgan_xs",
        "value": round(vps, 3),
        "unit": "volumes/s/chip",
        "detail": {
            "steps": n_steps,
            "phase": phase,
            "batch": batch,
            "transfer_dtype": cfg.transfer_dtype,
            "native_prefetch": True,
            "wall_s_incl_compile": round(wall, 1),
        },
    }
    print("PROD_THROUGHPUT " + json.dumps(out), flush=True)
    with open(os.path.join(outdir, "prod_throughput.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
