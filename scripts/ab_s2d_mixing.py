"""Mixing-half A/B under the s2d engine: fused vs unfused transitions.

The round-5 headline's mixing half (traced alpha, transition blending)
runs 332 ms vs the stabilizing half's 277: the fused transition
(upscale_conv, one lhs-dilated conv) is NOT covered by the s2d fold, so
under the s2d default the mixing program mixes engines.  This measures
whether repeat-upscale + FOLDED conv now beats the fused lhs-dilated conv
it lost to in round 2 (direct-engine era: fused +5.6%).

Usage: python scripts/ab_s2d_mixing.py [phase=6] [batch=8]
"""

from __future__ import annotations

import dataclasses
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
    from saragan_tpu.ops import core as ops_core
    from saragan_tpu.parallel.mesh import aot_with_options, resolve_compiler_options
    from saragan_tpu.train import init_train_state, make_train_step
    from saragan_tpu.utils import enable_compile_cache

    enable_compile_cache()

    phase = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    shape = (2 ** (phase - 1), 2 ** (phase + 1), 2 ** (phase + 1))

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
        adam_beta1=0.0,
        adam_beta2=0.9,
        g_lr=1e-3,
        d_lr=1e-3,
        compute_dtype="bfloat16",
        fused_grads=True,
    ).finalize()

    variants = {
        "s2d_fused": dataclasses.replace(base, fused_transitions=True),
        "s2d_unfused": dataclasses.replace(base, fused_transitions=False),
    }

    arch = get_architecture("pgan")
    opts = resolve_compiler_options(base.scoped_vmem_kib)
    defaults = ops_core.CONV3D_ALGORITHM
    ops_core.CONV3D_ALGORITHM = "s2d"
    states, steps, losses0 = {}, {}, {}
    try:
        for name, cfg in variants.items():
            state, (g_opt, d_opt) = init_train_state(
                arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg
            )
            states[name] = state
            # MIXING program: traced alpha (static_alpha=None)
            steps[name] = aot_with_options(
                jax.jit(
                    make_train_step(arch, cfg, phase, g_opt, d_opt, static_alpha=None),
                    donate_argnums=(0,),
                ),
                opts,
            )

        import ml_dtypes

        real = jax.device_put(
            np.random.default_rng(0).normal(size=(batch, 1) + shape)
            .astype(np.float32).astype(ml_dtypes.bfloat16)
        )
        rng = jax.random.PRNGKey(1)
        for name in variants:
            t0 = time.perf_counter()
            states[name], m = steps[name](states[name], real, rng, 0.5, 1e-3, 1e-3)
            losses0[name] = float(m.gen_loss)
            print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s "
                  f"gen_loss={losses0[name]:.5f}", flush=True)

        n_steps = int(os.environ.get("AB_STEPS", "30"))
        n_rounds = int(os.environ.get("AB_ROUNDS", "4"))
        times = {name: [] for name in variants}
        for r in range(n_rounds):
            for name in variants:
                st, step, k = states[name], steps[name], rng
                t0 = time.perf_counter()
                for _ in range(n_steps):
                    k, sub = jax.random.split(k)
                    st, m = step(st, real, sub, 0.5, 1e-3, 1e-3)
                _ = float(m.gen_loss)
                dt = (time.perf_counter() - t0) / n_steps
                states[name] = st
                times[name].append(dt * 1e3)
                print(f"[round {r}] {name}: {dt * 1e3:.1f} ms/step", flush=True)
    finally:
        ops_core.CONV3D_ALGORITHM = defaults

    out = {
        name: {"ms_per_step": round(float(np.median(ts)), 1),
               "first_gen_loss": round(losses0[name], 5)}
        for name, ts in times.items()
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
