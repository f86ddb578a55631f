"""Benchmark: volumes/sec/chip for the 3D pgan full training step at
128x128x32 (the north-star metric from BASELINE.json).

Reference baseline: the TF1 codebase measured ~6 volumes/s/GPU at 64x64x16
(pgan 'xs', WGAN-GP simultaneous, SURFGAN_3D/out.txt:84-103); scaled by the
8x voxel ratio that is ~0.75 volumes/s/GPU at 128x128x32 (BASELINE.md).

Config: pgan 'xs' filter sizing, base (1,1,4,4) -> phase 6 = 32x128x128
volumes (z,y,x), WGAN-GP simultaneous, bf16 compute / fp32 params, one chip.
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_VPS = 0.75  # TF1-GPU volumes/s/chip estimate at 128x128x32 (BASELINE.md)


def main():
    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    phase = 6  # (1,1,4,4) * 2^(6-1) = 32 x 128 x 128
    batch = 8  # best measured throughput point that fits one chip's HBM
    cfg = Config(
        architecture="pgan",
        start_shape="(1, 1, 4, 4)",
        final_shape="(1, 128, 512, 512)",
        latent_dim=256,
        base_batch_size=batch * (2 ** (phase - 1)),
        network_size="xs",
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        adam_beta1=0.0,
        adam_beta2=0.9,
        g_lr=1e-3,
        d_lr=1e-3,
        compute_dtype="bfloat16",
        fused_transitions=True,  # exact upscale+conv fusion (+5.6% measured)
    ).finalize()

    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    step = jax.jit(make_train_step(arch, cfg, phase, g_opt, d_opt), donate_argnums=(0,))

    real = jax.device_put(
        np.random.default_rng(0).normal(size=(batch, 1, 32, 128, 128)).astype(np.float32)
    )
    rng = jax.random.PRNGKey(1)

    # warmup / compile. NB: through the axon relay block_until_ready returns
    # early; a scalar *fetch* is the only reliable completion barrier, and the
    # donated-state dependency chain makes the timed steps strictly serial.
    state, metrics = step(state, real, rng, 0.0, 1e-3, 1e-3)
    _ = float(metrics.gen_loss)

    n_steps = 50
    t0 = time.perf_counter()
    for i in range(n_steps):
        rng, k = jax.random.split(rng)
        state, metrics = step(state, real, k, 0.0, 1e-3, 1e-3)
    _ = float(metrics.gen_loss)  # forces the whole chain
    dt = time.perf_counter() - t0

    vps = batch * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "train_volumes_per_sec_per_chip_128x128x32_pgan_xs_wgangp_bf16",
                "value": round(vps, 3),
                "unit": "volumes/s/chip",
                "vs_baseline": round(vps / BASELINE_VPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
