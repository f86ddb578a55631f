"""Benchmark: volumes/sec/chip for the 3D pgan full training step at
128x128x32 (the north-star metric from BASELINE.json).

Reference baseline: the TF1 codebase measured ~6 volumes/s/GPU at 64x64x16
(pgan 'xs', WGAN-GP simultaneous, SURFGAN_3D/out.txt:84-103); scaled by the
8x voxel ratio that is ~0.75 volumes/s/GPU at 128x128x32 (BASELINE.md).

Config: pgan 'xs' filter sizing, base (1,1,4,4) -> phase 6 = 32x128x128
volumes (z,y,x), WGAN-GP simultaneous, bf16 compute / fp32 params, one chip.

The headline is the PHASE-AVERAGE step: the trainer runs the mixing half
with traced alpha and the stabilizing half with alpha bound statically to 0
(make_train_step(static_alpha=0.0) prunes the transition branches — exact),
so a phase's wall-clock is the mean of the two step times.  Both variants
use the default shared-fake-pass WGAN gradient assembly (cfg.fused_grads)
and exact upscale+conv transition fusion (cfg.fused_transitions).

Timeout-robust structure (VERDICT r3: the round-3 bench compiled four
programs at 5-8 cold minutes each through the relay before printing
anything, and the driver's window expired with zero output):

* the HEADLINE JSON line is printed AND flushed immediately after the two
  phase-6 measurements (two compiles);
* the serving and phase-7 detail sections each check a wall-clock budget
  (env SARAGAN_BENCH_BUDGET_S, default 2100 s) before compiling and are
  skipped — recorded as null with a "skipped" note — when over it;
* a second, SUPERSEDING full JSON line follows with all detail (the driver
  parses the last JSON line; an expired window still holds the headline);
* the JAX persistent compilation cache is enabled (SARAGAN_COMPILE_CACHE,
  default ~/.cache/saragan_jax_cache) so repeat runs skip cold compiles.

MFU (VERDICT r3 item 3): per-step program FLOPs are counted from the
optimized HLO of the exact bench programs (scripts/compute_flops.py, XLA
cost analysis — includes the GP double-backward) and reported as
mfu = flops / (time * bf16 peak of the detected chip).  The model-shaped
ceiling is ~12.5% MXU for this family: every conv has <=32 output
channels, filling <=32 of the MXU's 128 lanes (BASELINE.md "Conv-engine
design space CLOSED" lane argument).

Prints ONE headline JSON line early, then ONE superseding full line.
"""

from __future__ import annotations

import json
import os
import time

t_start = time.time()

import jax  # noqa: E402
import numpy as np  # noqa: E402

# Persistent compilation cache: repeat bench runs (and any other process
# opting in via the same env) reuse serialized executables instead of
# paying 5-8 cold minutes per program through the relay's remote compiler.
# SARAGAN_COMPILE_CACHE=0 disables.
from saragan_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

BASELINE_VPS = 0.75  # TF1-GPU volumes/s/chip estimate at 128x128x32 (BASELINE.md)

BUDGET_S = float(os.environ.get("SARAGAN_BENCH_BUDGET_S", "2100"))

# Program FLOPs per step from XLA cost analysis of the exact bench programs
# (scripts/compute_flops.py on the CPU backend; conv/dot FLOPs are op-shape
# properties, backend-independent).  Regenerate with the script if the
# bench config changes.
BENCH_FLOPS = {
    "phase6_mixing_b8": 3.426415017984e12,
    "phase6_stabilizing_b8": 3.419050868736e12,
    "phase7_stabilizing_b1": 9.67618789376e11,
    "serving_b8": 1.52560205824e11,
    "serving_b32": 6.10124759040e11,
    # the single_chip_big_volume program (remat_offload recompute included,
    # direct-engine count of the same contraction the Pallas kernel runs)
    "phase8_stabilizing_b1": 6.020240769024e12,
}

# bf16 peak TFLOP/s per chip by device kind (MFU denominator).  The 12.5%
# model ceiling: all convs here have <=32 output channels -> <=32/128 MXU
# lanes usable regardless of formulation (BASELINE.md lane argument).
_PEAKS = (("v5 lite", 197e12), ("v5e", 197e12), ("v6 lite", 918e12),
          ("v6e", 918e12), ("v5p", 459e12), ("v5", 459e12), ("v4", 275e12))


def chip_peak_flops():
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None, None
    for key, peak in _PEAKS:
        if key in kind:
            return kind, peak
    return kind, None


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
        fused_transitions=True,  # exact upscale+conv fusion (+5.6% measured)
        fused_grads=True,  # shared-fake-pass WGAN grads (+6.5% measured)
    ).finalize()


def measure_step(arch, cfg, phase: int, batch: int, shape, static_alpha, n_steps: int):
    """ms/step for one jitted variant, donated-state chained, one scalar
    fetch as the completion barrier (the relay returns early from
    block_until_ready — CLAUDE.md hardware rules)."""
    from saragan_tpu.parallel.mesh import aot_with_options, resolve_compiler_options
    from saragan_tpu.train import init_train_state, make_train_step

    # the trainer's op-formulation gates (round 5: s2d conv default on TPU,
    # +9% at this shape / +73% at phase 7 — BASELINE.md round-5 table);
    # bench measures what the trainer actually runs
    cfg.apply_runtime_opts()
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    # the trainer's default per-compile options (auto scoped-VMEM, ~+6.5%
    # measured — Config.scoped_vmem_kib docs); bench measures what the
    # trainer actually runs
    step = aot_with_options(
        jax.jit(
            make_train_step(arch, cfg, phase, g_opt, d_opt, static_alpha=static_alpha),
            donate_argnums=(0,),
        ),
        resolve_compiler_options(cfg.scoped_vmem_kib),
    )
    # stage the batch at the production input dtype (transfer_dtype auto ->
    # bfloat16 under bf16 compute, bit-exact — BASELINE.md input-transfer
    # A/B) so the bench compiles the exact program the trainer dispatches
    import ml_dtypes

    real = jax.device_put(
        np.random.default_rng(0).normal(size=(batch, 1) + shape)
        .astype(np.float32).astype(ml_dtypes.bfloat16)
    )
    rng = jax.random.PRNGKey(1)
    alpha = 0.5 if static_alpha is None else 0.0

    state, metrics = step(state, real, rng, alpha, 1e-3, 1e-3)
    _ = float(metrics.gen_loss)  # compile + warmup barrier

    t0 = time.perf_counter()
    for _ in range(n_steps):
        rng, k = jax.random.split(rng)
        state, metrics = step(state, real, k, alpha, 1e-3, 1e-3)
    _ = float(metrics.gen_loss)  # forces the whole chain
    return (time.perf_counter() - t0) / n_steps * 1e3


def measure_sampling(cfg, phase: int, batch: int, shape, n_iters: int):
    """ms/batch for the serving path: EMA generator sampling through
    tools/generate.make_keyed_sampler — the per-sample-keyed formulation
    tools/serve.py compiles (fused transitions + Pallas elementwise; also
    measured +8% over per-batch keys, scripts/ab_keyed_sampler.py)."""
    import jax.numpy as jnp

    from saragan_tpu.models import get_architecture
    from saragan_tpu.tools.generate import make_keyed_sampler
    from saragan_tpu.train import init_train_state
    from saragan_tpu.train.step import split_params

    # same engine the serving tools trace with (make_keyed_sampler itself
    # re-applies inference=True before tracing: direct, not s2d — the fold
    # loses on the forward-only path, round-5 bench)
    cfg.apply_runtime_opts(inference=True)
    arch = get_architecture(cfg.architecture)
    state, _ = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    g_ema, _ = split_params(state.ema)
    gen = make_keyed_sampler(cfg, phase, batch_size=batch, alpha=0.0)

    idxs = jnp.arange(batch, dtype=jnp.int32)
    out = gen(g_ema, jnp.full((batch,), 0, jnp.int32), idxs)
    _ = float(out.ravel()[0])  # compile + warmup barrier (relay rules)

    t0 = time.perf_counter()
    for i in range(n_iters):
        out = gen(g_ema, jnp.full((batch,), i + 1, jnp.int32), idxs)
    _ = float(out.ravel()[0])  # in-order execution: last ready => all done
    return (time.perf_counter() - t0) / n_iters * 1e3


def _mfu(flops, ms, peak):
    if not flops or not ms or not peak:
        return None
    return round(flops / (ms / 1e3) / peak, 5)


def measure_phase8_step(arch, n_steps: int):
    """ms/step for the phase-8 single-chip program: the
    --single_chip_big_volume preset exactly as scripts/phase8_single_chip.py
    runs it (remat_offload, Pallas conv, compute-dtype stats, window pool,
    batched_passes/fused_transitions off, 64 MB scoped VMEM)."""
    from saragan_tpu.config import Config
    from saragan_tpu.ops import core as ops_core
    from saragan_tpu.train import init_train_state, make_train_step

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
    defaults = (ops_core.POOL_WINDOW, ops_core.STATS_ACCUM_F32,
                ops_core.CONV3D_ALGORITHM)
    cfg.apply_runtime_opts()  # preset op gates (env vars keep precedence)
    try:
        state, (g_opt, d_opt) = init_train_state(
            arch, jax.random.PRNGKey(0), phase=8, cfg=cfg)
        step = jax.jit(
            make_train_step(arch, cfg, 8, g_opt, d_opt, static_alpha=0.0),
            donate_argnums=(0,),
        ).lower(
            state,
            jax.ShapeDtypeStruct((1, 1, 128, 512, 512), np.dtype("float32")),
            jax.random.PRNGKey(1), 0.0, 1e-3, 1e-3,
        ).compile(compiler_options={
            "xla_tpu_scoped_vmem_limit_kib": str(cfg.scoped_vmem_kib)})
    finally:
        (ops_core.POOL_WINDOW, ops_core.STATS_ACCUM_F32,
         ops_core.CONV3D_ALGORITHM) = defaults

    real = jax.device_put(
        np.random.default_rng(0).normal(size=(1, 1, 128, 512, 512))
        .astype(np.float32))
    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, real, rng, 0.0, 1e-3, 1e-3)
    _ = float(metrics.gen_loss)  # warmup barrier (relay rules)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        rng, k = jax.random.split(rng)
        state, metrics = step(state, real, k, 0.0, 1e-3, 1e-3)
    _ = float(metrics.gen_loss)
    return (time.perf_counter() - t0) / n_steps * 1e3


def main():
    from saragan_tpu.models import get_architecture

    arch = get_architecture("pgan")
    kind, peak = chip_peak_flops()

    # --- headline: phase 6 (32x128x128), batch 8 — mixing (traced alpha)
    # + stabilizing (static alpha=0) halves.  TWO compiles, then PRINT.
    cfg6 = make_cfg(6, 8)
    ms_mix = measure_step(arch, cfg6, 6, 8, (32, 128, 128), None, 40)
    ms_stab = measure_step(arch, cfg6, 6, 8, (32, 128, 128), 0.0, 40)
    ms_avg = (ms_mix + ms_stab) / 2
    vps = 8 / (ms_avg / 1e3)

    f_mix = BENCH_FLOPS.get("phase6_mixing_b8")
    f_stab = BENCH_FLOPS.get("phase6_stabilizing_b8")
    f_avg = (f_mix + f_stab) / 2 if (f_mix and f_stab) else None
    headline = {
        "metric": "train_volumes_per_sec_per_chip_128x128x32_pgan_xs_wgangp_bf16",
        "value": round(vps, 3),
        "unit": "volumes/s/chip",
        "vs_baseline": round(vps / BASELINE_VPS, 2),
        "detail": {
            "mixing_ms_per_step": round(ms_mix, 1),
            "stabilizing_ms_per_step": round(ms_stab, 1),
            "flops_per_step_phase_avg": f_avg,
            "mfu": _mfu(f_avg, ms_avg, peak),
            # MFU is ALGORITHMIC utilization: the numerator is the nominal
            # (direct-formulation) FLOPs — the default s2d engine executes
            # ~8x madds on its folded convs (structured zeros), so the
            # 12.5% lane ceiling of the direct formulation no longer binds;
            # the executed-madds utilization is correspondingly higher
            # (BASELINE.md round-5 s2d section)
            "mfu_model_ceiling": 0.125,  # of the DIRECT formulation (<=32/128 lanes)
            "device_kind": kind,
            "peak_bf16_flops": peak,
            "elapsed_s": round(time.time() - t_start, 1),
        },
    }
    print(json.dumps(headline), flush=True)

    def over_budget():
        return time.time() - t_start > BUDGET_S

    detail = dict(headline["detail"])

    # --- serving path: EMA generator sampling at phase 6, batch 8 ---
    if over_budget():
        detail["serving_note"] = "skipped (SARAGAN_BENCH_BUDGET_S exceeded)"
    else:
        ms_gen = measure_sampling(cfg6, 6, 8, (32, 128, 128), 40)
        detail["serving_ema_sample_ms_per_batch8"] = round(ms_gen, 1)
        detail["serving_volumes_per_sec"] = round(8 / (ms_gen / 1e3), 3)
        detail["serving_mfu"] = _mfu(BENCH_FLOPS.get("serving_b8"), ms_gen, peak)

    # --- serving bulk optimum: batch-32 bucket (VERDICT r4 item 8 — the
    # measured +54% throughput point, docs/PERFORMANCE.md batch curve) ---
    if over_budget():
        detail["serving_b32_note"] = "skipped (SARAGAN_BENCH_BUDGET_S exceeded)"
    else:
        ms_b32 = measure_sampling(cfg6, 6, 32, (32, 128, 128), 20)
        detail["serving_b32_ms_per_batch"] = round(ms_b32, 1)
        detail["serving_b32_volumes_per_sec"] = round(32 / (ms_b32 / 1e3), 3)
        detail["serving_b32_mfu"] = _mfu(
            BENCH_FLOPS.get("serving_b32"), ms_b32, peak)

    # --- phase 7 (64x256x256), batch 1: big-volume regression guard ---
    if over_budget():
        detail["phase7_note"] = "skipped (SARAGAN_BENCH_BUDGET_S exceeded)"
    else:
        cfg7 = make_cfg(7, 1)
        ms_p7 = measure_step(arch, cfg7, 7, 1, (64, 256, 256), 0.0, 10)
        detail["phase7_64x256x256_b1_ms_per_step"] = round(ms_p7, 1)
        detail["phase7_volumes_per_sec"] = round(1 / (ms_p7 / 1e3), 3)
        detail["phase7_mfu"] = _mfu(
            BENCH_FLOPS.get("phase7_stabilizing_b1"), ms_p7, peak)

    # --- phase 8 (128x512x512), batch 1: the single_chip_big_volume
    # program, now with a FLOPs denominator (VERDICT r4 item 1c).  Probed
    # LAST: its cold AOT is ~520 s through the relay (28 s warm via the
    # compile cache), so an expired budget costs only this line. ---
    if over_budget():
        detail["phase8_note"] = "skipped (SARAGAN_BENCH_BUDGET_S exceeded)"
    else:
        try:
            ms_p8 = measure_phase8_step(arch, 10)
            detail["phase8_128x512x512_b1_ms_per_step"] = round(ms_p8, 1)
            detail["phase8_volumes_per_sec"] = round(1 / (ms_p8 / 1e3), 3)
            detail["phase8_mfu"] = _mfu(
                BENCH_FLOPS.get("phase8_stabilizing_b1"), ms_p8, peak)
        except Exception as e:  # a phase-8 probe failure must not kill the bench
            detail["phase8_note"] = f"failed: {type(e).__name__}: {e}"[:300]

    detail["elapsed_s"] = round(time.time() - t_start, 1)
    full = dict(headline)
    full["detail"] = detail
    print(json.dumps(full), flush=True)


if __name__ == "__main__":
    main()
