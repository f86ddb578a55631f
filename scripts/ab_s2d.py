"""Interleaved A/B of space-to-depth channel packing (SARAGAN_CONV3D=s2d)
at the big-volume bench shapes.

VERDICT r4 item 1b: the BASELINE.md:779 lane-closure argument rests on
"output channels that do not exist" — s2d folding manufactures exactly
those channels (C -> 8C, F -> 8F, spatial dims halved), the one exact conv
formulation the closure does not cover.  This measures whether it moves
the phase-7 wall (0.92% MFU, 13x under the model ceiling).

Usage: python scripts/ab_s2d.py [phase=7] [batch=1]

Variants gate which convs fold via core._S2D_MAX_CIN (in-channel cap):
  direct   — baseline XLA direct conv
  s2d16    — fold convs with C<=16 (folded C up to 128 = full lane fill)
  s2d8     — fold only the skinniest (C<=8) full-res convs

Protocol (CLAUDE.md hardware rules): all variants compiled in ONE process
with the ops.core globals patched around each variant's first (tracing)
call; timing rounds interleave the compiled executables round-robin;
donated-state chaining with one scalar fetch per timed block; medians.
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
    from saragan_tpu.ops import core as ops_core
    from saragan_tpu.parallel.mesh import aot_with_options, resolve_compiler_options
    from saragan_tpu.train import init_train_state, make_train_step
    from saragan_tpu.utils import enable_compile_cache

    enable_compile_cache()

    phase = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    shape = (2 ** (phase - 1), 2 ** (phase + 1), 2 ** (phase + 1))

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
        fused_transitions=True,
        fused_grads=True,
    ).finalize()

    # name -> (CONV3D_ALGORITHM, _S2D_MAX_CIN, POOL_WINDOW, STATS_ACCUM_F32)
    if os.environ.get("AB_S2D_REFINE"):
        # round-5 refinement: the phase-8 layout knobs on TOP of s2d
        # (they lost at phase 7 with direct; the s2d program's layouts
        # are different, so re-measure)
        variants = {
            "s2d16": ("s2d", 16, False, True),
            "s2d32": ("s2d", 32, False, True),
            "s2d16_window": ("s2d", 16, True, True),
            "s2d16_stats": ("s2d", 16, False, False),
        }
    else:
        variants = {
            "direct": ("direct", 16, False, True),
            "s2d16": ("s2d", 16, False, True),
            "s2d8": ("s2d", 8, False, True),
        }

    arch = get_architecture("pgan")
    opts = resolve_compiler_options(cfg.scoped_vmem_kib)
    states, steps = {}, {}
    for name in variants:
        state, (g_opt, d_opt) = init_train_state(
            arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg
        )
        states[name] = state
        steps[name] = aot_with_options(
            jax.jit(
                make_train_step(arch, cfg, phase, g_opt, d_opt, static_alpha=0.0),
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

    defaults = (ops_core.CONV3D_ALGORITHM, ops_core._S2D_MAX_CIN,
                ops_core.POOL_WINDOW, ops_core.STATS_ACCUM_F32)
    losses0 = {}
    try:
        for name, (alg, max_cin, pw, sf) in variants.items():
            ops_core.CONV3D_ALGORITHM = alg
            ops_core._S2D_MAX_CIN = max_cin
            ops_core.POOL_WINDOW = pw
            ops_core.STATS_ACCUM_F32 = sf
            t0 = time.perf_counter()
            states[name], m = steps[name](states[name], real, rng, 0.0, 1e-3, 1e-3)
            losses0[name] = float(m.gen_loss)
            print(
                f"[compile] {name}: {time.perf_counter() - t0:.1f}s "
                f"gen_loss={losses0[name]:.5f}",
                flush=True,
            )
    finally:
        (ops_core.CONV3D_ALGORITHM, ops_core._S2D_MAX_CIN,
         ops_core.POOL_WINDOW, ops_core.STATS_ACCUM_F32) = defaults

    n_steps = int(os.environ.get("AB_STEPS", "10"))
    n_rounds = int(os.environ.get("AB_ROUNDS", "4"))
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
        out[name] = {
            "ms_per_step": round(med, 1),
            "vol_per_s": round(batch / (med / 1e3), 3),
            "first_gen_loss": round(losses0[name], 5),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
