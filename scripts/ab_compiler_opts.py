"""Interleaved A/B on the real chip: proto-backed compiler options on the
bench hot step.

`xla_tpu_scoped_vmem_limit_kib` is the one compiler knob proven to forward
through the axon relay (BASELINE.md phase-8 wall #9, parallel/mesh.py::
aot_with_options).  The phase-8 recipe needed it raised for Pallas halo
windows; this probe asks the open question for the HEADLINE step: does a
larger scoped-VMEM budget let XLA form bigger fusions at phase 6 / phase 7?

Protocol (CLAUDE.md): one process, donated-state chains, one value fetch
per block, variants interleaved, medians.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_cfg(phase: int, batch: int):
    from saragan_tpu.config import Config

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
    ).finalize()


def main():
    from saragan_tpu.models import get_architecture
    from saragan_tpu.parallel.mesh import aot_with_options
    from saragan_tpu.train import init_train_state, make_train_step

    phase = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else (8 if phase == 6 else 1)
    # argv[3:] variants, each either a bare KiB int (scoped-VMEM limit) or a
    # general `name:key=val;key=val` proto-backed option set (any DebugOptions
    # field the remote compiler knows; unknown keys reject the row).
    # Default sweep: backend 16 MB vs the historical limits.  >=64 MB
    # SIGKILLs the relay's AOT compile-helper subprocess at the phase-6
    # program (host-side compiler OOM, not HBM) — measured.
    def parse_variant(tok: str):
        if ":" not in tok:
            lim = int(tok)
            return f"vmem_{lim}", {"xla_tpu_scoped_vmem_limit_kib": str(lim)}
        name, spec = tok.split(":", 1)
        opts = dict(kv.split("=", 1) for kv in spec.split(";") if kv)
        return name, (opts or None)

    variants = [("vmem_default", None)] + (
        [parse_variant(t) for t in sys.argv[3:]] if len(sys.argv) > 3 else
        [parse_variant(str(l)) for l in (32768, 65536, 131072)]
    )

    cfg = make_cfg(phase, batch)
    arch = get_architecture("pgan")
    shape = tuple(cfg.current_shape(phase, 1))[1:]

    states, steps = {}, {}
    for name, opts in variants:
        state, (g_opt, d_opt) = init_train_state(
            arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg
        )
        states[name] = state
        jitted = jax.jit(
            make_train_step(arch, cfg, phase, g_opt, d_opt, static_alpha=0.0),
            donate_argnums=(0,),
        )
        # on_fail="raise": a rejected option set must DROP the row (the except
        # below), not silently benchmark the backend default under its name
        steps[name] = aot_with_options(jitted, opts, on_fail="raise")

    real = jax.device_put(
        np.random.default_rng(0).normal(size=(batch,) + shape).astype(np.float32)
    )
    rng = jax.random.PRNGKey(1)

    for name in list(steps):
        t0 = time.perf_counter()
        try:
            states[name], m = steps[name](states[name], real, rng, 0.0, 1e-3, 1e-3)
            _ = float(m.gen_loss)
            print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)
        except Exception as e:
            print(f"[compile] {name}: FAILED {type(e).__name__}: {e}", flush=True)
            del steps[name], states[name]

    n_steps, n_rounds = 30, 4
    times = {name: [] for name in steps}
    for r in range(n_rounds):
        for name in steps:
            st, step, k = states[name], steps[name], rng
            t0 = time.perf_counter()
            for _ in range(n_steps):
                k, sub = jax.random.split(k)
                st, m = step(st, real, sub, 0.0, 1e-3, 1e-3)
            _ = float(m.gen_loss)
            dt = (time.perf_counter() - t0) / n_steps * 1e3
            states[name] = st
            times[name].append(dt)
            print(f"[round {r}] {name}: {dt:.1f} ms/step", flush=True)

    out = {n: {"ms_per_step": round(float(np.median(t)), 1),
               "vol_per_s": round(batch / (float(np.median(t)) / 1e3), 2)}
           for n, t in times.items()}
    print(json.dumps({"phase": phase, "batch": batch, **out}, indent=2))


if __name__ == "__main__":
    main()
