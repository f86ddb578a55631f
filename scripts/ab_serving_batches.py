"""Serving latency/throughput curve on the real chip: EMA generator
sampling at a given phase across batch sizes, production serving config
(fused transitions + Pallas elementwise + auto scoped-VMEM — what
tools/serve.py and tools/generate.py compile).

One process, every batch size compiled up front, interleaved round-robin,
chained through a scalar carry folded into the latent key (relay rules:
only value fetches block), medians over rounds.  Produces the
latency-vs-batch table for docs/PERFORMANCE.md's serving section.

    python scripts/ab_serving_batches.py [phase=6] [batches=1,2,4,8,16,32]
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
    batches = ([int(b) for b in sys.argv[2].split(",")] if len(sys.argv) > 2
               else [1, 2, 4, 8, 16, 32])

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

    samplers = {}
    for b in batches:

        # per-sample-keyed formulation — what tools/serve.py's micro-batcher
        # compiles (make_keyed_sampler); also measured faster than per-batch
        # keys (33.2 -> 30.5 ms/batch-8, scripts/ab_keyed_sampler.py)
        def gen(params, rng, carry, b=b):
            def one(k):
                k_z, k_g = jax.random.split(k)
                z = jax.random.normal(k_z, (1, cfg.latent_dim)) + carry * 0
                return arch.generator(params, z, 0.0, phase=phase, cfg=cfg,
                                      rng=k_g, train=False)[0]
            out = jax.vmap(one)(jax.random.split(rng, b))
            return jnp.mean(out.astype(jnp.float32))

        samplers[b] = aot_with_options(jax.jit(gen), opts)

    rng = jax.random.PRNGKey(2)
    carries = {}
    for b, fn in list(samplers.items()):
        t0 = time.perf_counter()
        try:
            c = fn(g_ema, rng, jnp.zeros((), jnp.float32))
            _ = float(c)
        except Exception as e:  # e.g. HBM OOM at big batch x big phase
            print(f"[compile] batch {b}: FAILED {type(e).__name__}: {e}", flush=True)
            del samplers[b]
            continue
        carries[b] = c
        print(f"[compile] batch {b}: {time.perf_counter() - t0:.1f}s", flush=True)

    n_iters, n_rounds = 40, 4
    times = {b: [] for b in samplers}
    for r in range(n_rounds):
        for b, fn in samplers.items():
            c, k = carries[b], rng
            t0 = time.perf_counter()
            for _ in range(n_iters):
                k, sub = jax.random.split(k)
                c = fn(g_ema, sub, c)
            _ = float(c)
            dt = (time.perf_counter() - t0) / n_iters * 1e3
            times[b].append(dt)
            carries[b] = c
            print(f"[round {r}] batch {b}: {dt:.1f} ms/batch", flush=True)

    out = {}
    for b, ts in times.items():
        med = float(np.median(ts))
        out[f"batch_{b}"] = {
            "ms_per_batch": round(med, 2),
            "ms_per_volume": round(med / b, 2),
            "vol_per_s": round(b / (med / 1e3), 1),
        }
    print(json.dumps({"phase": phase, **out}, indent=2))


if __name__ == "__main__":
    main()
