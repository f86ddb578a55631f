"""Pallas TPU kernels — fused elementwise chains of the PGGAN block.

Every pgan conv layer is followed by bias -> leaky_relu -> pixel_norm
(generator, reference networks/pgan/generator.py:48-71) or bias ->
leaky_relu (discriminator).  XLA fuses much of this, but the pixel_norm's
cross-channel reduction forces a separate pass over the activation in
practice; this kernel does the whole chain in one VMEM round trip:

    HBM read x  ->  (+bias, lrelu, channel-rsqrt-normalize)  ->  HBM write y

Layout: NC(D)HW with a grid over (N, spatial rows); each block holds the
full channel extent so the pixel_norm reduction is block-local (C is the
sublane-major axis of the (C, W) tile; W maps to the 128 lanes).

Gradients: `fused_bias_act_pixelnorm` carries a custom VJP whose backward is
plain jnp (recompute-from-inputs) — pure-jnp backward keeps the op
twice-differentiable, which the WGAN-GP grad-of-grad requires.

The kernel runs compiled on TPU and in interpreter mode elsewhere (CPU
tests), selected automatically.  `SARAGAN_PALLAS=0` disables the fused path
entirely (falls back to the unfused jnp ops).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # TPU-only namespace; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

PALLAS_ENABLED = os.environ.get("SARAGAN_PALLAS", "1") != "0"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# fused bias + leaky_relu + pixel_norm
# ---------------------------------------------------------------------------


def _fused_kernel(x_ref, b_ref, o_ref, *, alpha_lr: float, pixelnorm: bool, eps: float):
    # strictly 2D (sublane=C, lane=T) blocks, math in f32 — 3D blocks and
    # bf16 compares both hit Mosaic layout limits on the real chip
    x = x_ref[:].astype(jnp.float32)  # (C, T)
    b = b_ref[:].astype(jnp.float32)  # (C, 1), broadcasts over lanes
    y = x + b
    y = jnp.where(y >= 0, y, y * alpha_lr)
    if pixelnorm:
        m = jnp.mean(jnp.square(y), axis=0, keepdims=True)
        y = y * lax.rsqrt(m + eps)
    o_ref[:] = y.astype(o_ref.dtype)


def _fused_forward(x: jax.Array, b: jax.Array, alpha_lr: float, pixelnorm: bool,
                   eps: float = 1e-8) -> jax.Array:
    """x: (N, C, *spatial); b: (C,)."""
    orig_shape = x.shape
    n, c = x.shape[:2]
    total = 1
    for s in x.shape[2:]:
        total *= s
    x2 = x.reshape(n * c, total)
    b2 = b.reshape(c, 1)

    # tiles sized to stay comfortably inside VMEM (halving keeps tile a
    # divisor of total; Mosaic pads sub-128 lane tiles)
    tile = total
    while c * tile * x.dtype.itemsize * 2 > 4 * 1024 * 1024 and tile % 2 == 0:
        tile //= 2
    grid = (n, total // tile)

    out = pl.pallas_call(
        functools.partial(_fused_kernel, alpha_lr=alpha_lr, pixelnorm=pixelnorm, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n * c, total), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, tile), lambda i, j: (i, j)),
            pl.BlockSpec((c, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c, tile), lambda i, j: (i, j)),
        interpret=not _on_tpu(),
    )(x2, b2)
    return out.reshape(orig_shape)


def _reference_forward(x, b, alpha_lr, pixelnorm, eps=1e-8):
    """Unfused jnp oracle (identical math)."""
    bb = b.reshape((1, -1) + (1,) * (x.ndim - 2)).astype(x.dtype)
    y = x + bb
    y = jnp.where(y >= 0, y, y * jnp.asarray(alpha_lr, y.dtype))
    if pixelnorm:
        m = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=1, keepdims=True)
        y = (y.astype(jnp.float32) * lax.rsqrt(m + eps)).astype(x.dtype)
    return y


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3))
def fused_bias_act_pixelnorm(x: jax.Array, b: jax.Array, alpha_lr: float, pixelnorm: bool):
    """bias + leaky_relu (+ pixel_norm) in one HBM round trip.

    custom_jvp (not custom_vjp): the tangent rule is plain jnp, so the op is
    differentiable to ANY order — reverse-mode falls out by transposition and
    the WGAN-GP grad-of-grad composes.  Undifferentiated forwards take the
    fused Pallas path; differentiated paths recompute the jnp reference for
    the linearization (the primal still uses the kernel)."""
    return _fused_forward(x, b, alpha_lr, pixelnorm)


@fused_bias_act_pixelnorm.defjvp
def _fused_jvp(alpha_lr, pixelnorm, primals, tangents):
    x, b = primals
    dx, db = tangents
    primal_out = fused_bias_act_pixelnorm(x, b, alpha_lr, pixelnorm)
    _, tangent_out = jax.jvp(
        lambda x, b: _reference_forward(x, b, alpha_lr, pixelnorm), (x, b), (dx, db)
    )
    return primal_out, tangent_out


def bias_act_pixelnorm(x, b, alpha_lr: float = 0.2, pixelnorm: bool = True,
                       force: Optional[bool] = None):
    """Dispatcher: fused Pallas path when enabled, jnp chain otherwise."""
    use = PALLAS_ENABLED if force is None else force
    if use:
        return fused_bias_act_pixelnorm(x, b, alpha_lr, pixelnorm)
    return _reference_forward(x, b, alpha_lr, pixelnorm)


# ---------------------------------------------------------------------------
# fused minibatch stddev (reference ops.py:313-325 in one pass)
# ---------------------------------------------------------------------------


def _mbstd_kernel(x_ref, o_ref, *, eps: float, groups: int, gsize: int):
    # 2D full-array block (groups*G, F); static per-group loop
    x = x_ref[:].astype(jnp.float32)
    for g in range(groups):
        blk = x[g * gsize : (g + 1) * gsize]
        mu = jnp.mean(blk, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(blk - mu), axis=0)
        val = jnp.mean(jnp.sqrt(var + eps))
        o_ref[g, :] = jnp.full((o_ref.shape[1],), val, o_ref.dtype)


def minibatch_stddev_stat(x: jax.Array, group_size: int = 4, eps: float = 1e-8):
    """Per-group scalar stddev statistic (the value tiled into the extra
    channel by minibatch_stddev_layer). One fused pass per group.

    STANDALONE BENCHMARK KERNEL, not wired into the production D path:
    minibatch_stddev sits inside the twice-differentiated WGAN-GP
    discriminator and this bare pallas_call has no AD rule, so
    ops.core.minibatch_stddev_layer keeps the jnp formulation (and mbstd
    never runs in inference — D is not sampled). Kept as the
    hardware-validated fusion measurement from round 1 (BASELINE.md).

    Grouping matches the reference's reshape([G, -1, ...]) (ops.py:317):
    group m aggregates the *interleaved* samples {m, m+M, m+2M, ...}."""
    n = x.shape[0]
    group_size = min(group_size, n)
    assert n % group_size == 0
    groups = n // group_size
    flat = x.reshape(group_size, groups, -1).transpose(1, 0, 2)
    feat = flat.shape[-1]
    flat2 = flat.reshape(groups * group_size, feat)
    out = pl.pallas_call(
        functools.partial(_mbstd_kernel, eps=eps, groups=groups, gsize=group_size),
        out_shape=jax.ShapeDtypeStruct((groups, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=getattr(pltpu, "VMEM", None)) if pltpu else pl.BlockSpec((groups * group_size, feat), lambda: (0, 0))],
        out_specs=pl.BlockSpec((groups, 128), lambda: (0, 0)),
        interpret=not _on_tpu(),
    )(flat2)
    return out[:, :1]  # (groups, 1)
