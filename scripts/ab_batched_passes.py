"""Interleaved A/B on the real chip: batched_passes (fake+real critic
passes through ONE vmap-stacked 2N-batched D forward/backward) vs the
round-3 fused_grads baseline.

Protocol (CLAUDE.md hardware rules): all variants compiled in ONE process,
steps chained through donated state, one scalar value-fetch per timed block,
variants interleaved round-robin.  Medians over rounds.

Config matches bench.py: 3D pgan 'xs' phase 6 (32x128x128), batch 8,
WGAN-GP simultaneous, bf16 compute, fused transitions + fused grads on.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    phase = 6
    batch = 8

    def make_cfg(batched_passes):
        return Config(
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
            fused_transitions=True,
            fused_grads=True,
            batched_passes=batched_passes,
        ).finalize()

    arch = get_architecture("pgan")
    cfg_s = make_cfg(False)  # separate passes (round-3 baseline)
    cfg_b = make_cfg(True)

    variants = {
        # name -> (cfg, static_alpha)
        "separate_traced": (cfg_s, None),
        "batched_traced": (cfg_b, None),
        "separate_static0": (cfg_s, 0.0),
        "batched_static0": (cfg_b, 0.0),
    }

    states = {}
    steps = {}
    for name, (cfg, sa) in variants.items():
        state, (g_opt, d_opt) = init_train_state(
            arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg
        )
        states[name] = state
        steps[name] = jax.jit(
            make_train_step(arch, cfg, phase, g_opt, d_opt, static_alpha=sa),
            donate_argnums=(0,),
        )

    real = jax.device_put(
        np.random.default_rng(0).normal(size=(batch, 1, 32, 128, 128)).astype(np.float32)
    )
    rng = jax.random.PRNGKey(1)

    for name in variants:
        t0 = time.perf_counter()
        states[name], m = steps[name](states[name], real, rng, 0.0, 1e-3, 1e-3)
        _ = float(m.gen_loss)
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    n_steps = 30
    n_rounds = 4
    times = {name: [] for name in variants}
    for r in range(n_rounds):
        for name in variants:
            st = states[name]
            step = steps[name]
            k = rng
            t0 = time.perf_counter()
            for _ in range(n_steps):
                k, sub = jax.random.split(k)
                st, m = step(st, real, sub, 0.0, 1e-3, 1e-3)
            _ = float(m.gen_loss)
            dt = (time.perf_counter() - t0) / n_steps
            states[name] = st
            times[name].append(dt * 1e3)
            print(f"[round {r}] {name}: {dt * 1e3:.1f} ms/step", flush=True)

    out = {}
    for name, ts in times.items():
        med = float(np.median(ts))
        out[name] = {"ms_per_step": round(med, 1), "vol_per_s": round(batch / (med / 1e3), 2)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
