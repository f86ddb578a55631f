"""Interleaved A/B on the real chip: vmapped G/D formulations of the FULL
production train step.

Motivation: the serving probe (scripts/ab_keyed_sampler.py) found the
per-sample-vmapped generator compiles ~8% FASTER than the natively-batched
call — XLA picks different (better) layouts/fusions for the vmapped graph.
This asks whether the same formulation shift wins on the training step:

  - vmap_g:  generator computed as vmap over single samples.  Exact for
    pgan: G has no cross-batch ops (pixel_norm/instance_norm are
    per-sample), and the bench config passes no G noise.
  - vmap_d:  discriminator computed as vmap over minibatch-stddev stat
    groups.  mbstd groups are STRIDED (reshape (G, n/G), stats over axis 0
    at fixed m — ops/core.py:738-757), so vmapping over the m axis hands
    each instance exactly one stat group of G samples: bit-exact stats.
  - vmap_gd: both.

Protocol (CLAUDE.md): one process, donated-state chains, one value fetch
per block, variants interleaved, medians of 4x30.

    python scripts/ab_vmap_formulation.py [phase=6] [batch=8]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_compiler_opts import make_cfg  # noqa: E402  (same bench config)


def wrap_generator_vmap(arch):
    base_g = arch.generator

    def generator(params, z, alpha, *, phase, cfg, rng=None, train=True, **kw):
        def one(zz):
            return base_g(params, zz[None], alpha, phase=phase, cfg=cfg,
                          rng=rng, train=train, **kw)[0]
        return jax.vmap(one)(z)

    return arch._replace(generator=generator)


def wrap_discriminator_vmap(arch):
    base_d = arch.discriminator

    def discriminator(params, x, alpha, *, phase, cfg, **kw):
        n = x.shape[0]
        g = min(4, n)  # reference mbstd group size (ops.py:313-325)
        if n % g:
            return base_d(params, x, alpha, phase=phase, cfg=cfg, **kw)
        xg = x.reshape((g, n // g) + x.shape[1:])
        out = jax.vmap(
            lambda xs: base_d(params, xs, alpha, phase=phase, cfg=cfg, **kw),
            in_axes=1, out_axes=1,
        )(xg)
        return out.reshape((n,) + out.shape[2:])

    return arch._replace(discriminator=discriminator)


def main():
    from saragan_tpu.models import get_architecture
    from saragan_tpu.parallel.mesh import aot_with_options, resolve_compiler_options
    from saragan_tpu.train import init_train_state, make_train_step

    phase = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    cfg = make_cfg(phase, batch)
    base = get_architecture("pgan")
    variants = {
        "base": base,
        "vmap_g": wrap_generator_vmap(base),
        "vmap_d": wrap_discriminator_vmap(base),
        "vmap_gd": wrap_discriminator_vmap(wrap_generator_vmap(base)),
    }
    shape = tuple(cfg.current_shape(phase, 1))[1:]
    opts = resolve_compiler_options(cfg.scoped_vmem_kib)

    states, steps = {}, {}
    for name, arch in variants.items():
        state, (g_opt, d_opt) = init_train_state(
            base, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
        states[name] = state
        jitted = jax.jit(
            make_train_step(arch, cfg, phase, g_opt, d_opt, static_alpha=0.0),
            donate_argnums=(0,),
        )
        steps[name] = aot_with_options(jitted, opts)

    real = jax.device_put(
        np.random.default_rng(0).normal(size=(batch,) + shape).astype(np.float32))
    rng = jax.random.PRNGKey(1)

    # equality spot-check on the first step (identical init + inputs):
    # the vmapped formulations must produce the same losses as base
    ref_losses = None
    for name in list(steps):
        t0 = time.perf_counter()
        try:
            states[name], m = steps[name](states[name], real, rng, 0.0, 1e-3, 1e-3)
            gl, dl = float(m.gen_loss), float(m.disc_loss)
            print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s "
                  f"g={gl:.6f} d={dl:.6f}", flush=True)
            if ref_losses is None:
                ref_losses = (gl, dl)
            else:
                dg = abs(gl - ref_losses[0]) / (abs(ref_losses[0]) + 1e-8)
                dd = abs(dl - ref_losses[1]) / (abs(ref_losses[1]) + 1e-8)
                print(f"    rel diff vs base: g={dg:.2e} d={dd:.2e}", flush=True)
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
