"""Shared model helpers for the num_filters-table architectures
(pgan2/pgandeep/stylegan/stylegan2/surfgan)."""

from __future__ import annotations

from saragan_tpu import ops


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
    reference used big-RAM CPU nodes for these, scripts/run_haswell.jb)."""
    if getattr(cfg, "remat_offload", False):
        from jax.ad_checkpoint import checkpoint_name

        return checkpoint_name(x, name)
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
