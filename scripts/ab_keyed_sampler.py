"""Interleaved A/B on the real chip: per-sample-keyed (vmapped) generator
sampling vs the classic per-batch-keyed formulation.

The serving endpoint's micro-batcher needs output row j to depend only on
its own (seed, idx) — tools/generate.py::make_keyed_sampler vmaps the whole
generator (latent draw + StyleGAN noise) over per-sample keys.  XLA should
batch the vmapped batch-1 convs back into the same program as the native
batched call; this probe verifies that on hardware (relay rules: one
process, interleaved, chained through a scalar carry, medians over rounds).

    python scripts/ab_keyed_sampler.py [phase=6] [batch=8]
"""

from __future__ import annotations

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
    from saragan_tpu.parallel.mesh import aot_with_options, resolve_compiler_options
    from saragan_tpu.train import init_train_state
    from saragan_tpu.train.step import split_params

    phase = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    cfg = Config(
        architecture="pgan",
        start_shape="(1, 1, 4, 4)",
        final_shape="(1, 128, 512, 512)",
        latent_dim=256,
        base_batch_size=8 * (2 ** (phase - 1)),
        network_size="xs",
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
        compute_dtype="bfloat16",
        fused_transitions=True,
        use_pallas_fusion=True,
    ).finalize()

    arch = get_architecture("pgan")
    state, _ = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    g_ema, _ = split_params(state.ema)
    opts = resolve_compiler_options(cfg.scoped_vmem_kib)

    def gen_batched(params, seed, carry):
        k_z, k_g = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(seed), 0))
        z = jax.random.normal(k_z, (batch, cfg.latent_dim)) + carry * 0
        out = arch.generator(params, z, 0.0, phase=phase, cfg=cfg, rng=k_g, train=False)
        return jnp.mean(out.astype(jnp.float32))

    def gen_keyed(params, seed, carry):
        def one(s, j):
            k_z, k_g = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(s), j))
            z = jax.random.normal(k_z, (1, cfg.latent_dim)) + carry * 0
            return arch.generator(params, z, 0.0, phase=phase, cfg=cfg,
                                  rng=k_g, train=False)[0]
        out = jax.vmap(one)(jnp.full((batch,), seed, jnp.int32),
                            jnp.arange(batch, dtype=jnp.int32))
        return jnp.mean(out.astype(jnp.float32))

    samplers = {
        "batched_keys": aot_with_options(jax.jit(gen_batched), opts),
        "per_sample_keys": aot_with_options(jax.jit(gen_keyed), opts),
    }

    carries = {}
    for name, fn in samplers.items():
        t0 = time.perf_counter()
        c = fn(g_ema, jnp.int32(1), jnp.zeros((), jnp.float32))
        _ = float(c)
        carries[name] = c
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    n_iters, n_rounds = 40, 4
    times = {n: [] for n in samplers}
    for r in range(n_rounds):
        for name, fn in samplers.items():
            c = carries[name]
            t0 = time.perf_counter()
            for _ in range(n_iters):
                c = fn(g_ema, jnp.int32(r + 2), c)
            _ = float(c)
            dt = (time.perf_counter() - t0) / n_iters * 1e3
            times[name].append(dt)
            carries[name] = c
            print(f"[round {r}] {name}: {dt:.1f} ms/batch", flush=True)

    out = {n: round(float(np.median(ts)), 2) for n, ts in times.items()}
    print(json.dumps({"phase": phase, "batch": batch, "ms_per_batch": out}, indent=2))


if __name__ == "__main__":
    main()
