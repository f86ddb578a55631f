"""Per-family hot-step bench on the real chip: one WGAN-GP train step for
ALL SIX model families at a common geometry (phase 5 on the cubic base =
64x64x64 volumes, batch 4, bf16, round-3 defaults: fused transitions +
fused grads where the family/loss admits them + batched passes +
static_alpha=0).

The headline bench (bench.py) tracks the flagship pgan only; this records
the zoo-wide step times so family-level regressions are visible.  Protocol
per CLAUDE.md: all variants compiled in ONE process, donated-state chains,
one scalar fetch per timed block, interleaved round-robin, medians.

Run: python scripts/bench_families.py [batch] [n_steps] [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES = ["pgan", "pgan2", "pgandeep", "stylegan", "stylegan2", "surfgan"]
PHASE = int(os.environ.get("SARAGAN_BENCH_PHASE", 5))  # (1,4,4,4) base -> 64^3 at 5


def main():
    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    size = 4 * 2 ** (PHASE - 1)
    shape = (size, size, size)

    def make_cfg(arch):
        return Config(
            architecture=arch,
            start_shape="(1, 4, 4, 4)",
            final_shape=f"(1, {2 * size}, {2 * size}, {2 * size})",
            starting_phase=PHASE,  # stylegan2 asserts single-phase
            ending_phase=PHASE,
            latent_dim=256,
            base_batch_size=batch * (2 ** (PHASE - 1)),
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

    states, steps = {}, {}
    for arch_name in FAMILIES:
        cfg = make_cfg(arch_name)
        arch = get_architecture(arch_name)
        state, (g_opt, d_opt) = init_train_state(
            arch, jax.random.PRNGKey(0), phase=PHASE, cfg=cfg
        )
        states[arch_name] = state
        steps[arch_name] = jax.jit(
            make_train_step(arch, cfg, PHASE, g_opt, d_opt, static_alpha=0.0),
            donate_argnums=(0,),
        )

    real = jax.device_put(
        np.random.default_rng(0).normal(size=(batch, 1) + shape).astype(np.float32)
    )
    rng = jax.random.PRNGKey(1)

    for name in FAMILIES:
        t0 = time.perf_counter()
        states[name], m = steps[name](states[name], real, rng, 0.0, 1e-3, 1e-3)
        _ = float(m.gen_loss)
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    times = {name: [] for name in FAMILIES}
    for r in range(n_rounds):
        for name in FAMILIES:
            st, step = states[name], steps[name]
            k = rng
            t0 = time.perf_counter()
            for _ in range(n_steps):
                k, sub = jax.random.split(k)
                st, m = step(st, real, sub, 0.0, 1e-3, 1e-3)
            _ = float(m.gen_loss)
            dt = (time.perf_counter() - t0) / n_steps * 1e3
            states[name] = st
            times[name].append(dt)
            print(f"[round {r}] {name}: {dt:.1f} ms/step", flush=True)

    out = {}
    for name, ts in times.items():
        med = float(np.median(ts))
        out[name] = {"ms_per_step": round(med, 1),
                     "vol_per_s": round(batch / (med / 1e3), 2)}
    print(json.dumps({"phase": PHASE, "shape": list(shape), "batch": batch,
                      "families": out}, indent=2))


if __name__ == "__main__":
    main()
