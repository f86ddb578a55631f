"""Interleaved serving-path A/B on the real chip: EMA generator sampling at
phase 6 (32x128x128), batch 8, bf16 — baseline vs exact fused transitions
vs fused + Pallas elementwise kernels (the fast_inference default).

The round-1 sampling numbers (200.7 / 250.8 / 258.3 vol/s) were separate
isolated runs; bench.py r3 measured 200.6 vol/s for the fused+Pallas path
on its run — isolated-op measurements carry ~3x run-to-run variance
(CLAUDE.md).  This pins the comparison the trustworthy way: all three
sampler variants compiled in ONE process, interleaved round-robin, chained
through a scalar carry folded into the latent key, medians over rounds.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state
    from saragan_tpu.train.step import split_params

    phase = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    base = Config(
        architecture="pgan",
        start_shape="(1, 1, 4, 4)",
        final_shape="(1, 128, 512, 512)",
        latent_dim=256,
        base_batch_size=batch * (2 ** (phase - 1)),
        network_size="xs",
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
        compute_dtype="bfloat16",
        fused_transitions=False,
        use_pallas_fusion=False,
    ).finalize()

    variants = {
        "baseline": base,
        "fused_transitions": dataclasses.replace(base, fused_transitions=True),
        "fused_plus_pallas": dataclasses.replace(
            base, fused_transitions=True, use_pallas_fusion=True
        ),
    }

    arch = get_architecture("pgan")
    state, _ = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=base)
    g_ema, _ = split_params(state.ema)

    samplers = {}
    for name, cfg in variants.items():

        def gen(params, rng, carry, cfg=cfg):
            k_z, k_g = jax.random.split(rng)
            # carry*0 chains iterations data-dependently (relay rules)
            z = jax.random.normal(k_z, (batch, cfg.latent_dim)) + carry * 0
            out = arch.generator(params, z, 0.0, phase=phase, cfg=cfg, rng=k_g, train=False)
            return jnp.mean(out.astype(jnp.float32))

        samplers[name] = jax.jit(gen)

    rng = jax.random.PRNGKey(2)
    carries = {}
    for name, fn in samplers.items():
        t0 = time.perf_counter()
        c = fn(g_ema, rng, jnp.zeros((), jnp.float32))
        _ = float(c)
        carries[name] = c
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    n_iters, n_rounds = 40, 4
    times = {name: [] for name in samplers}
    for r in range(n_rounds):
        for name, fn in samplers.items():
            c = carries[name]
            k = rng
            t0 = time.perf_counter()
            for _ in range(n_iters):
                k, sub = jax.random.split(k)
                c = fn(g_ema, sub, c)
            _ = float(c)
            dt = (time.perf_counter() - t0) / n_iters * 1e3
            times[name].append(dt)
            carries[name] = c
            print(f"[round {r}] {name}: {dt:.1f} ms/batch", flush=True)

    out = {}
    for name, ts in times.items():
        med = float(np.median(ts))
        out[name] = {"ms_per_batch": round(med, 1), "vol_per_s": round(batch / (med / 1e3), 1)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
