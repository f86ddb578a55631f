"""Interleaved A/B on the real chip: K train steps per dispatch via
`lax.scan` vs K donated-state chained per-step dispatches.

Hypothesis: through the axon relay each dispatch carries fixed host/relay
overhead that per-step chaining cannot fully hide for SMALL phases (device
step time in the low ms), while at the bench phase (hundreds of ms) async
queueing already hides it.  A scan-of-K step is the TPU-native "training
loop on device" pattern: one XLA program advances K steps, so host round
trips drop from K to 1 per block.

Both variants reuse ONE device-resident real batch per step so the A/B
isolates dispatch overhead (the trainer's input transfer/prefetch cost is
identical either way and measured elsewhere).

Protocol (CLAUDE.md hardware rules): all variants compiled in ONE process,
chained through donated state, one scalar value-fetch per timed block,
variants interleaved round-robin, medians over rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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


def build(phase: int, batch: int, K: int):
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    cfg = make_cfg(phase, batch)
    arch = get_architecture("pgan")
    # stabilizing-half hot step (bench headline variant)
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    step_fn = make_train_step(arch, cfg, phase, g_opt, d_opt, static_alpha=0.0)

    step = jax.jit(step_fn, donate_argnums=(0,))

    def scan_steps(state, real, rng):
        def body(s, k):
            s, m = step_fn(s, real, k, 0.0, 1e-3, 1e-3)
            return s, m.gen_loss

        keys = jax.random.split(rng, K)
        state, losses = lax.scan(body, state, keys)
        return state, losses[-1]

    scan = jax.jit(scan_steps, donate_argnums=(0,))
    return cfg, arch, state, step, scan


def main():
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    n_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    which = sys.argv[1] if len(sys.argv) > 1 else "3,6"
    pairs = {"3": (3, 64), "6": (6, 8)}
    results = {}
    for phase, batch in (pairs[p] for p in which.split(",")):
        shape = {3: (4, 16, 16), 6: (32, 128, 128)}[phase]
        cfg, arch, state0, step, scan = build(phase, batch, K)
        real = jax.device_put(
            np.random.default_rng(0).normal(size=(batch, 1) + shape).astype(np.float32)
        )
        rng = jax.random.PRNGKey(1)

        # two independent states so donation chains don't cross variants
        states = {"dispatch": state0, "scan": jax.tree.map(jnp.copy, state0)}

        t0 = time.perf_counter()
        states["dispatch"], m = step(states["dispatch"], real, rng, 0.0, 1e-3, 1e-3)
        _ = float(m.gen_loss)
        t1 = time.perf_counter()
        states["scan"], last = scan(states["scan"], real, rng)
        _ = float(last)
        t2 = time.perf_counter()
        print(
            f"[compile] phase {phase}: step {t1 - t0:.1f}s, scan {t2 - t1:.1f}s",
            flush=True,
        )

        times = {"dispatch": [], "scan": []}
        for r in range(n_rounds):
            # per-step dispatch block
            st = states["dispatch"]
            k = rng
            t0 = time.perf_counter()
            for _ in range(K):
                k, sub = jax.random.split(k)
                st, m = step(st, real, sub, 0.0, 1e-3, 1e-3)
            _ = float(m.gen_loss)
            dt = (time.perf_counter() - t0) / K * 1e3
            states["dispatch"] = st
            times["dispatch"].append(dt)

            # scan block
            st = states["scan"]
            t0 = time.perf_counter()
            st, last = scan(st, real, jax.random.fold_in(rng, r))
            _ = float(last)
            ds = (time.perf_counter() - t0) / K * 1e3
            states["scan"] = st
            times["scan"].append(ds)
            print(
                f"[round {r}] phase {phase}: dispatch {dt:.2f} ms/step, scan {ds:.2f} ms/step",
                flush=True,
            )

        results[f"phase{phase}_b{batch}"] = {
            name: round(float(np.median(ts)), 3) for name, ts in times.items()
        }

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
