"""Component breakdown of the round-3 hot step on the real chip.

Decomposes the default stabilizing-half train step (static_alpha=0,
fused_transitions + fused_grads + batched_passes, bf16, phase 6 batch 8 —
the bench.py config) into:

  * g_fwd     — generator sampling only
  * d_fwd2n   — ONE vmap-stacked 2N-batched critic forward (the
                batched_passes forward shape)
  * gp_grads  — the gradient-penalty term alone: inner grad wrt the
                interpolates + reverse-over-reverse parameter grads
                (losses._gp_slopes path)
  * step_nogp — full train step with apply_gp=False (joint G+D fwd/bwd +
                optimizer/EMA, no GP)
  * step_full — the default full step

so step_full - step_nogp isolates today's GP cost and step_nogp - the
forwards isolates the joint backward + optimizer.  Protocol (CLAUDE.md
hardware rules): every variant compiled in ONE process, interleaved
round-robin, medians over rounds; train-step variants chain through
donated state, loss-level variants chain through a scalar fed back into
the input (real + carry*0) so the relay cannot return early.
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
    from saragan_tpu import losses
    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    phase = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
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

    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    state_nogp, _ = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)

    step_full = jax.jit(
        make_train_step(arch, cfg, phase, g_opt, d_opt, static_alpha=0.0),
        donate_argnums=(0,),
    )
    step_nogp = jax.jit(
        make_train_step(arch, cfg, phase, g_opt, d_opt, apply_gp=False, static_alpha=0.0),
        donate_argnums=(0,),
    )

    compute_dtype = jnp.bfloat16
    # dedicated (never-donated) param trees for the loss-level closures —
    # the train-step variants donate their state, which deletes its buffers
    state_ref, _ = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    g_params, d_params = state_ref.g_params, state_ref.d_params

    def gen_a(p, z, k=None):
        return arch.generator(p, z, 0.0, phase=phase, cfg=cfg, rng=k)

    def disc_a(p, x):
        return arch.discriminator(p, x, 0.0, phase=phase, cfg=cfg)

    @jax.jit
    def g_fwd(carry, rng):
        k_z, k_g = jax.random.split(rng)
        z = jax.random.normal(k_z, (batch, cfg.latent_dim), compute_dtype) + carry * 0
        return jnp.mean(gen_a(g_params, z, k_g).astype(jnp.float32))

    real_np = np.random.default_rng(0).normal(size=(batch, 1) + shape).astype(np.float32)
    real = jax.device_put(real_np.astype(np.float16)).astype(compute_dtype)

    @jax.jit
    def d_fwd2n(carry, rng):
        k = jax.random.split(rng, 1)[0]
        noise = jax.random.normal(k, real.shape, compute_dtype)
        stacked = jnp.stack([real + carry * 0, noise])
        scores = jax.vmap(disc_a, in_axes=(None, 0))(d_params, stacked)
        return jnp.mean(scores.astype(jnp.float32))

    axes = losses._simultaneous_axes(real.ndim, False)

    @jax.jit
    def gp_grads(carry, rng):
        k_f, k_gamma = jax.random.split(rng)
        fake = jax.random.normal(k_f, real.shape, compute_dtype)
        gamma = jax.random.uniform(k_gamma, (batch,) + (1,) * (real.ndim - 1), compute_dtype)
        interp = gamma * (real + carry * 0) + (1 - gamma) * fake

        def f_gp(d_p):
            slopes = losses._gp_slopes(disc_a, d_p, interp, axes)
            return jnp.mean(cfg.gp_weight * (slopes - 1.0) ** 2)

        gp, grads = jax.value_and_grad(f_gp)(d_params)
        # consume every grad leaf so XLA cannot prune parts of the backward
        return gp + sum(jnp.vdot(g, g).real.astype(jnp.float32) for g in jax.tree_util.tree_leaves(grads)) * 1e-30

    real_f32 = jax.device_put(real_np)
    rng = jax.random.PRNGKey(1)

    # ---- compile/warmup all variants
    t0 = time.perf_counter()
    state, m = step_full(state, real_f32, rng, 0.0, 1e-3, 1e-3)
    _ = float(m.gen_loss)
    print(f"[compile] step_full: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    state_nogp, m = step_nogp(state_nogp, real_f32, rng, 0.0, 1e-3, 1e-3)
    _ = float(m.gen_loss)
    print(f"[compile] step_nogp: {time.perf_counter() - t0:.1f}s", flush=True)
    carries = {}
    for name, fn in (("g_fwd", g_fwd), ("d_fwd2n", d_fwd2n), ("gp_grads", gp_grads)):
        t0 = time.perf_counter()
        c = fn(jnp.zeros((), jnp.float32), rng)
        _ = float(c)
        carries[name] = c
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    n_steps = 30
    n_rounds = 4
    times = {k: [] for k in ("step_full", "step_nogp", "g_fwd", "d_fwd2n", "gp_grads")}

    for r in range(n_rounds):
        # train-step variants: donated-state chains
        for name, (st, step) in (("step_full", (state, step_full)),
                                 ("step_nogp", (state_nogp, step_nogp))):
            k = rng
            t0 = time.perf_counter()
            for _ in range(n_steps):
                k, sub = jax.random.split(k)
                st, m = step(st, real_f32, sub, 0.0, 1e-3, 1e-3)
            _ = float(m.gen_loss)
            dt = (time.perf_counter() - t0) / n_steps * 1e3
            times[name].append(dt)
            if name == "step_full":
                state = st
            else:
                state_nogp = st
            print(f"[round {r}] {name}: {dt:.1f} ms", flush=True)
        # loss-level variants: scalar-carry chains
        for name, fn in (("g_fwd", g_fwd), ("d_fwd2n", d_fwd2n), ("gp_grads", gp_grads)):
            c = carries[name]
            k = rng
            t0 = time.perf_counter()
            for _ in range(n_steps):
                k, sub = jax.random.split(k)
                c = fn(c * 0, sub)
            _ = float(c)
            dt = (time.perf_counter() - t0) / n_steps * 1e3
            times[name].append(dt)
            carries[name] = c
            print(f"[round {r}] {name}: {dt:.1f} ms", flush=True)

    out = {k: round(float(np.median(v)), 1) for k, v in times.items()}
    out["gp_share_ms"] = round(out["step_full"] - out["step_nogp"], 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
