"""Interleaved A/B on the real chip: per-step input-transfer cost in the
production trainer loop.

Every existing step A/B (ab_round3/ab_batched_passes/...) and bench.py
chain steps over a DEVICE-RESIDENT batch, so the per-step host->device
input transfer the trainer actually pays (trainer.py feeds a fresh host
numpy batch into the jitted step each iteration) has never been measured
in isolation. This script measures, in ONE process (CLAUDE.md hardware
rules: donated-state chaining, one scalar fetch per timed block,
round-robin interleaving, medians):

  resident      device-resident f32 batch reused every step (bench.py's
                formulation -- the zero-transfer upper bound)
  host_f32      fresh host float32 batch passed straight to the jitted
                step each iteration (the trainer's default path with
                --transfer_dtype float32)
  host_f16      same with float16 batches (--transfer_dtype float16; the
                step casts to compute dtype on device, step.py:171)
  ahead_f32     double-buffered: jax.device_put of batch i+1 is issued
                BEFORE step i is dispatched, so the copy can overlap the
                previous step's device execution if the runtime allows
  ahead_f16     same at float16

If host_* ~= resident, transfers are already hidden by async dispatch and
the trainer needs no change. If host_* > resident and ahead_* recovers
the gap, the trainer should ship a device_put-ahead double buffer. If
ahead_* does not recover it, the relay's transfer cost is host-side
serialization (CPU-bound at dispatch) and the only lever is fewer bytes
(--transfer_dtype float16, already shipped).

Config matches bench.py: 3D pgan 'xs' phase 6 (32x128x128), batch 8,
WGAN-GP simultaneous, bf16 compute, round-3 defaults, static_alpha=0.
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
    import jax.numpy as jnp

    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.parallel.mesh import aot_with_options, resolve_compiler_options
    from saragan_tpu.train import init_train_state, make_train_step

    phase = 6
    batch = 8
    shape = (32, 128, 128)
    all_variants = ["resident", "host_f32", "host_f16", "host_bf16",
                    "ahead_f32", "ahead_f16", "ahead_bf16"]
    variants = (sys.argv[1].split(",") if len(sys.argv) > 1 else
                ["resident", "host_f32", "host_f16", "ahead_f32", "ahead_f16"])
    assert all(v in all_variants for v in variants), variants

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
    ).finalize()

    arch = get_architecture("pgan")
    opts = resolve_compiler_options(cfg.scoped_vmem_kib)

    dtype_of = {
        "resident": "float32",
        "host_f32": "float32",
        "ahead_f32": "float32",
        "host_f16": "float16",
        "ahead_f16": "float16",
        "host_bf16": "bfloat16",
        "ahead_bf16": "bfloat16",
    }

    # one compiled step per input dtype (input dtype is part of the jit
    # signature); each VARIANT still carries its own donated state
    steps = {}
    states = {}
    for name in variants:
        state, (g_opt, d_opt) = init_train_state(
            arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg
        )
        states[name] = state
    for dt in sorted({dtype_of[v] for v in variants}):
        steps[dt] = aot_with_options(
            jax.jit(
                make_train_step(arch, cfg, phase, g_opt, d_opt, static_alpha=0.0),
                donate_argnums=(0,),
            ),
            opts,
        )

    # a rotating pool of pre-built host batches so numpy allocation/cast
    # cost stays out of the timed loop (the trainer's prefetcher does this
    # work on a worker thread)
    rng_np = np.random.default_rng(0)
    np_dt = {"float32": np.float32, "float16": np.float16,
             "bfloat16": jnp.bfloat16}
    pool = {
        dt: [rng_np.normal(size=(batch, 1) + shape).astype(np_dt[dt])
             for _ in range(4)]
        for dt in sorted({dtype_of[v] for v in variants})
    }
    resident = (jax.device_put(pool["float32"][0])
                if "resident" in variants else None)
    rng = jax.random.PRNGKey(1)

    # warm every (variant, program) pair once
    for name in variants:
        t0 = time.perf_counter()
        b = resident if name == "resident" else pool[dtype_of[name]][0]
        states[name], m = steps[dtype_of[name]](states[name], b, rng, 0.0, 1e-3, 1e-3)
        _ = float(m.gen_loss)
        print(f"[compile/warm] {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    n_steps = 30
    n_rounds = 4
    times = {name: [] for name in variants}
    for r in range(n_rounds):
        for name in variants:
            st = states[name]
            step = steps[dtype_of[name]]
            batches = pool[dtype_of[name]]
            k = rng
            if name.startswith("ahead"):
                nxt = jax.device_put(batches[0])
            t0 = time.perf_counter()
            for i in range(n_steps):
                k, sub = jax.random.split(k)
                if name == "resident":
                    st, m = step(st, resident, sub, 0.0, 1e-3, 1e-3)
                elif name.startswith("host"):
                    st, m = step(st, batches[i % 4], sub, 0.0, 1e-3, 1e-3)
                else:  # ahead: issue the NEXT transfer before dispatching
                    cur = nxt
                    nxt = jax.device_put(batches[(i + 1) % 4])
                    st, m = step(st, cur, sub, 0.0, 1e-3, 1e-3)
            _ = float(m.gen_loss)
            dt_ms = (time.perf_counter() - t0) / n_steps * 1e3
            states[name] = st
            times[name].append(dt_ms)
            print(f"[round {r}] {name}: {dt_ms:.1f} ms/step", flush=True)

    out = {}
    for name, ts in times.items():
        med = float(np.median(ts))
        out[name] = {"ms_per_step": round(med, 1),
                     "vol_per_s": round(batch / (med / 1e3), 2)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
