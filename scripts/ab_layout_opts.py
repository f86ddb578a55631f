"""Interleaved A/B of the layout-safe op formulations at bench scales.

The phase-8 single-chip work built layout-safe variants of the stats ops
(SARAGAN_POOL=window, SARAGAN_STATS_DTYPE=compute) and the Pallas flat
conv engine because XLA:TPU's channel-on-lanes layouts pad skinny-channel
full-res tensors 8-256x at 512^2 planes (BASELINE.md "Phase-8 on one chip").
This script asks whether those same formulations also WIN TIME at the
bench phases (the round-2 verdict estimated a ~15% ceiling for
layout-conversion elimination and left it unpursued).

Usage: python scripts/ab_layout_opts.py [phase=6] [batch=8] [with_pallas=0]

Protocol (CLAUDE.md hardware rules): all variants compiled in ONE process;
the option globals in ops.core are patched around each variant's FIRST
call (jit traces then), so each compiled executable bakes its own setting;
after compiles the globals are restored and the timing rounds interleave
the already-compiled executables round-robin.  Steps chain through donated
state; one scalar fetch per timed block; medians over rounds.
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
    from saragan_tpu.train import init_train_state, make_train_step

    phase = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    with_pallas = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
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
    ).finalize()

    # name -> (POOL_WINDOW, STATS_ACCUM_F32, CONV3D_ALGORITHM)
    variants = {
        "base": (False, True, "direct"),
        "window": (True, True, "direct"),
        "stats_compute": (False, False, "direct"),
        "window+stats": (True, False, "direct"),
    }
    if with_pallas:
        variants["phase8_recipe"] = (True, False, "pallas")

    arch = get_architecture("pgan")
    states, steps = {}, {}
    for name in variants:
        state, (g_opt, d_opt) = init_train_state(
            arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg
        )
        states[name] = state
        steps[name] = jax.jit(
            make_train_step(arch, cfg, phase, g_opt, d_opt, static_alpha=0.0),
            donate_argnums=(0,),
        )

    real = jax.device_put(
        np.random.default_rng(0).normal(size=(batch, 1) + shape).astype(np.float32)
    )
    rng = jax.random.PRNGKey(1)

    defaults = (ops_core.POOL_WINDOW, ops_core.STATS_ACCUM_F32, ops_core.CONV3D_ALGORITHM)
    losses0 = {}
    try:
        for name, (pw, sf, alg) in variants.items():
            ops_core.POOL_WINDOW = pw
            ops_core.STATS_ACCUM_F32 = sf
            ops_core.CONV3D_ALGORITHM = alg
            t0 = time.perf_counter()
            states[name], m = steps[name](states[name], real, rng, 0.0, 1e-3, 1e-3)
            losses0[name] = float(m.gen_loss)
            print(
                f"[compile] {name}: {time.perf_counter() - t0:.1f}s "
                f"gen_loss={losses0[name]:.5f}",
                flush=True,
            )
    finally:
        ops_core.POOL_WINDOW, ops_core.STATS_ACCUM_F32, ops_core.CONV3D_ALGORITHM = defaults

    n_steps = int(os.environ.get("AB_STEPS", "30"))
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
            "vol_per_s": round(batch / (med / 1e3), 2),
            "first_gen_loss": round(losses0[name], 5),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
