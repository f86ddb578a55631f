"""Compute per-step FLOPs for the bench programs from XLA's cost analysis.

The MFU denominator for bench.py (VERDICT r3 item 3): FLOPs are counted
from the optimized HLO of the EXACT program the bench measures
(make_train_step with the production levers), via
`jit(...).lower(...).compile().cost_analysis()["flops"]` on the CPU
backend — backend-independent op math (conv/dot FLOPs are properties of
the op shapes, not the backend), so the count transfers to the TPU
program modulo small fusion differences.  This is "program FLOPs"
(includes the GP double-backward and any rematerialization actually in
the program), the honest numerator for `mfu = flops / (time * peak)`.

Run on the CPU platform (the phase-6 CPU compile takes minutes):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/compute_flops.py

Prints one JSON line per program; the resulting constants live in
bench.py (BENCH_FLOPS) and BASELINE.md.  Pass `tiny` to smoke-run the
machinery on small shapes (tests/test_bench_smoke.py does).
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp


def program_flops(cfg, phase: int, batch: int, shape, static_alpha):
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    arch = get_architecture(cfg.architecture)
    state, (g_opt, d_opt) = init_train_state(
        arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    step = jax.jit(
        make_train_step(arch, cfg, phase, g_opt, d_opt,
                        static_alpha=static_alpha))
    compute = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    real = jnp.zeros((batch, 1) + shape, compute)
    alpha = 0.5 if static_alpha is None else 0.0
    lowered = step.lower(state, real, jax.random.PRNGKey(1), alpha, 1e-3, 1e-3)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {"flops": float(ca["flops"]),
            "bytes_accessed": float(ca.get("bytes accessed", 0.0))}


def sampler_flops(cfg, phase: int, batch: int):
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state
    from saragan_tpu.train.step import split_params
    from saragan_tpu.tools.generate import make_keyed_sampler

    arch = get_architecture(cfg.architecture)
    state, _ = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    g_ema, _ = split_params(state.ema)
    gen = make_keyed_sampler(cfg, phase, batch_size=batch, alpha=0.0)
    idxs = jnp.arange(batch, dtype=jnp.int32)
    seeds = jnp.zeros((batch,), jnp.int32)
    lowered = jax.jit(gen).lower(g_ema, seeds, idxs)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {"flops": float(ca["flops"]),
            "bytes_accessed": float(ca.get("bytes accessed", 0.0))}


def main(tiny: bool = False):
    sys.path.insert(0, ".")
    from bench import make_cfg

    if tiny:
        from saragan_tpu.config import Config

        cfg = Config(
            architecture="pgan", start_shape="(1, 4, 4, 4)",
            final_shape="(1, 16, 16, 16)", latent_dim=16, base_batch_size=8,
            kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
            filter_spec=[[8, 8], [8, 8]], loss_fn="wgan", gp_weight=10.0,
            noise_stddev=0.0, g_lr=1e-3, d_lr=1e-3,
        ).finalize()
        out = {"tiny_stabilizing": program_flops(cfg, 2, 8, (8, 8, 8), 0.0)}
        print(json.dumps(out))
        return out

    cfg6 = make_cfg(6, 8)
    cfg7 = make_cfg(7, 1)
    out = {
        "phase6_mixing_b8": program_flops(cfg6, 6, 8, (32, 128, 128), None),
        "phase6_stabilizing_b8": program_flops(cfg6, 6, 8, (32, 128, 128), 0.0),
        "phase7_stabilizing_b1": program_flops(cfg7, 7, 1, (64, 256, 256), 0.0),
        "serving_b8": sampler_flops(cfg6, 6, 8),
        # serving bulk optimum (VERDICT r4 item 8): the batch-32 bucket is
        # the measured +54% throughput point (docs/PERFORMANCE.md)
        "serving_b32": sampler_flops(cfg6, 6, 32),
    }
    if "with_phase8" in sys.argv[1:]:
        out["phase8_stabilizing_b1"] = phase8_flops()
    for k, v in out.items():
        print(json.dumps({k: v}), flush=True)
    print(json.dumps(out))
    return out


def phase8_flops():
    """Per-step FLOPs of the phase-8 single-chip program (VERDICT r4 item
    1c): the --single_chip_big_volume preset (remat_offload ON — recompute
    FLOPs are real and counted; batched_passes/fused_transitions OFF;
    compute-dtype stats; window pool), counted with the DIRECT conv engine
    on CPU.  The TPU preset runs SARAGAN_CONV3D=pallas, but conv FLOPs are
    op-shape properties and the Pallas kernel computes the same contraction
    — the direct-engine HLO is the honest denominator for its math."""
    from saragan_tpu.config import Config
    from saragan_tpu.ops import core as ops_core

    cfg = Config(
        architecture="pgan",
        start_shape="(1, 1, 4, 4)",
        final_shape="(1, 256, 1024, 1024)",  # doubling extended one level
        latent_dim=256,
        base_batch_size=2 ** 7,  # batch 1 at phase 8
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
        single_chip_big_volume=True,
    ).finalize()
    cfg.apply_runtime_opts()
    ops_core.CONV3D_ALGORITHM = "direct"  # countable on the CPU backend
    try:
        return program_flops(cfg, 8, 1, (128, 512, 512), 0.0)
    finally:
        ops_core.POOL_WINDOW = False
        ops_core.STATS_ACCUM_F32 = True


if __name__ == "__main__":
    main(tiny="tiny" in sys.argv[1:])
