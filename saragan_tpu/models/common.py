"""Shared model helpers for the num_filters-table architectures
(pgan2/pgandeep/stylegan/stylegan2/surfgan)."""

from __future__ import annotations

import jax

from saragan_tpu import ops


def abstract_init_forward(fn, *args):
    """Trace an init-mode forward abstractly (jax.eval_shape) so parameter
    creation is the ONLY real compute.

    Scope.get in init mode derives each parameter from a CONCRETE
    closure-captured rng (key = fold_in(rng, crc32(name))), so inside the
    abstract trace every initializer still executes eagerly and the
    resulting params are bitwise identical to a concrete forward.  The data
    inputs / per-layer-noise rngs passed through `args` become abstract, so
    no activation is ever materialized — previously init ran the full
    forward EAGERLY op-by-op in f32, which at phase 8 (128x512x512) alone
    exceeded HBM (a single channels-minor f32[1,8,128,512,512] eager-reshape
    buffer pads 16x to 16 GB — measured, BASELINE.md round 3) and wasted
    seconds of relay round-trips per init at every phase.

    args may be jax.ShapeDtypeStruct (preferred for big volumes: nothing is
    allocated at all) or concrete arrays (eval_shape abstracts them)."""
    jax.eval_shape(fn, *args)


def static_alpha_zero(alpha) -> bool:
    """True when alpha is a compile-time Python 0 — the models then skip the
    phase-transition branches (prev-resolution to_rgb/from_rgb + blend)
    entirely.  Exact: at alpha == 0 those branches contribute 0 to the
    output and exactly-zero gradients, and jax.grad materializes the same
    zero grads for params the trace never reads, so optimizer/EMA updates
    are identical (see train/step.py make_train_step(static_alpha=...))."""
    return isinstance(alpha, (int, float)) and float(alpha) == 0.0


def block_tap(x, name: str, cfg):
    """Tag a per-resolution-block activation boundary for remat offload
    policies (jax.ad_checkpoint.checkpoint_name).  Gated on
    cfg.remat_offload so the default trace is untouched; under
    make_train_step's offload remat these names become the set of
    activations parked in pinned host memory during the forward pass and
    DMA'd back one block at a time in the backward — the single-chip answer
    to volumes whose activations exceed HBM (phase 8 = 128x512x512; the
    reference used big-RAM CPU nodes for these, scripts/run_haswell.jb).

    Taps are tagged in a FLAT (N, C, prod(spatial)) view: XLA:TPU gives
    channel-minor layouts to conv-adjacent 5D tensors, and the 128-lane tile
    pads the skinny channel dim (xs tapers to C=8 at the finest phase-8
    blocks) by 16x — the flat view puts the huge fused-spatial dim on the
    lanes, so the offloaded buffer (and its host DMA) is unpadded.  Measured
    on hardware: the 5D f32 tap transfer alone was 16.00 G padded vs 1.00 G
    unpadded and OOM'd phase 8 by itself (BASELINE.md round 3).  The
    reshape pair is exact and free on the device side.
    """
    if getattr(cfg, "remat_offload", False):
        from jax.ad_checkpoint import checkpoint_name

        flat = x.reshape(x.shape[0], x.shape[1], -1)
        return checkpoint_name(flat, name).reshape(x.shape)
    return x


def offload_block_names(phase: int) -> list:
    """Every name block_tap can emit up to `phase` (superset is fine: names
    that never appear in the trace are ignored by the policy)."""
    names = ["gen_in", "disc_in"]
    for i in range(2, phase + 1):
        names += [f"gen_block_{i}", f"gen_block_{i}_mid",
                  f"disc_block_{i}", f"disc_block_{i}_mid"]
    return names


def adaptive_kernel(spatial_shape):
    """Per-dim kernel size: 1 if the dim is < 3 else 3 (reference
    networks/ops.py:25-29, `k(x)`), applied to the current tensor shape."""
    return [1 if s < 3 else 3 for s in spatial_shape]


def resolve_base_dim(cfg) -> int:
    """Filters of the first (constant/dense) layer: explicit override or the
    num_filters table at phase 1 (reference passes base_dim computed from
    num_filters in its __main__ harnesses)."""
    if cfg.first_conv_nfilters:
        return int(cfg.first_conv_nfilters)
    size = cfg.network_size or "xs"  # one None-fallback repo-wide (config.py resolved_filter_spec)
    if cfg.ndim == 3:
        return ops.num_filters(1, cfg.num_phases, cfg.base_shape, size=size)
    return ops.num_filters_2d(1, cfg.num_phases, size=size)


def spectral_iters(cfg) -> int:
    """Power-iteration count for the discriminator scope; 0 disables
    (reference get_weight's use_spectral_norm, ops.py:111-127)."""
    if getattr(cfg, "use_spectral_norm", False):
        return max(1, int(getattr(cfg, "spectral_iterations", 3)))
    return 0


def phase_filters(cfg, i: int) -> int:
    size = cfg.network_size or "xs"  # one None-fallback repo-wide (config.py resolved_filter_spec)
    if cfg.ndim == 3:
        return ops.num_filters(i, cfg.num_phases, cfg.base_shape, size=size)
    return ops.num_filters_2d(i, cfg.num_phases, size=size)
