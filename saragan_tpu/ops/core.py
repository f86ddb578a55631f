"""Functional op library — the TPU-native equivalent of the reference's
`networks/ops.py` (see /root/reference/SURFGAN_3D/networks/ops.py and
/root/reference/SURFGAN_2D/networks/ops.py).

Design notes (TPU-first, not a translation):

* Everything is a pure function over explicit parameters (`Scope`, core.py).
* Convs use ``lax.conv_general_dilated`` with NC(D)HW activations and
  ``(*kernel, in, out)`` weight layout — the same layout the reference stores
  (ops.py:148), so checkpoints round-trip by name.  XLA:TPU lays these onto
  the MXU; the channel contraction is the systolic dimension.
* The reference hand-writes custom first- and second-order gradients for
  ``leaky_relu`` (ops.py:167-182) and ``upscale3d``/``downscale3d``
  (ops.py:276-305).  Those custom gradients are *exactly* what JAX autodiff
  derives for ``jnp.where``-leaky-relu, nearest-repeat and mean-pool: the
  adjoint of nearest-repeat is sum-pool (= factor**n * avg-pool, matching
  ops.py:284) and the adjoint of avg-pool is (1/factor**n)-scaled repeat
  (matching ops.py:300).  We therefore use plain autodiff and pin the
  equivalence with second-order finite-difference tests
  (tests/test_ops.py), instead of porting `tf.custom_gradient` machinery.
* Ops are rank-generic: the spatial rank is inferred from ``x.ndim``
  (4 => 2D NCHW, 5 => 3D NCDHW), which unifies the reference's duplicated
  2D/3D op files.
* Mixed precision: parameters live in float32; weights/biases are cast to
  ``x.dtype`` at use (reference ops.py:143,149), so feeding bf16 activations
  runs the whole network in bf16 with fp32 master weights.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from saragan_tpu.core import Scope, normal_initializer, zeros_initializer

# ---------------------------------------------------------------------------
# Gains, equalized learning rate
# ---------------------------------------------------------------------------

_LINEAR_FNS = (
    "linear",
    "conv1d",
    "conv2d",
    "conv3d",
    "conv_transpose1d",
    "conv_transpose2d",
    "conv_transpose3d",
)


def calculate_gain(activation: str, param=None) -> float:
    """He-init gain per activation (reference ops.py:60-77)."""
    if activation in _LINEAR_FNS or activation == "sigmoid":
        return 1.0
    if activation == "tanh":
        return 5.0 / 3
    if activation == "relu":
        return math.sqrt(2.0)
    if activation == "leaky_relu":
        assert param is not None
        if not isinstance(param, bool) and isinstance(param, (int, float)):
            negative_slope = param
        else:
            raise ValueError(f"negative_slope {param} not a valid number")
        return math.sqrt(2.0 / (1 + negative_slope**2))
    raise ValueError(f"Unsupported nonlinearity {activation}")


def get_weight(
    scope: Scope,
    shape: Sequence[int],
    activation: str,
    lrmul: float = 1.0,
    use_eq_lr: bool = True,
    param=None,
    name: str = "weight",
) -> jax.Array:
    """Equalized-learning-rate weight (reference ops.py:111-127).

    The variable is initialized N(0, 1/lrmul) and scaled at *runtime* by
    ``he_std * lrmul`` so the effective weight has He stddev while the raw
    variable (and therefore the optimizer's per-step update scale) stays O(1).
    """
    fan_in = int(np.prod(shape[:-1]))
    gain = calculate_gain(activation, param)
    he_std = gain / math.sqrt(fan_in)
    init_std = 1.0 / lrmul
    runtime_coef = he_std * lrmul
    w = scope.get(name, shape, normal_initializer(init_std))
    if use_eq_lr:
        w = w * runtime_coef
    if getattr(scope, "spectral", 0):
        # Spectral normalization (reference ops.py:124-125 inside get_weight,
        # surfgan/ops.py:26-27).  The reference amortizes one power iteration
        # per step through an assigned non-trainable `u`; functionally we run
        # `scope.spectral` iterations per call from a persisted start vector
        # (same fixed point, no mutable state).  Gradients do not flow
        # through u/v (stop_gradient), so `u` receives exactly-zero grads and
        # never moves under the optimizer.
        u = scope.get(f"{name}_u", (1, shape[-1]), normal_initializer(1.0))
        w, _ = spectral_normalize(w, u, iterations=int(scope.spectral))
    return w


# ---------------------------------------------------------------------------
# Linear / conv primitives
# ---------------------------------------------------------------------------


def apply_bias(scope: Scope, x: jax.Array, lrmul: float = 1.0) -> jax.Array:
    """Channel bias on axis 1 (reference ops.py:130-136)."""
    b = scope.get("bias", (x.shape[1],), zeros_initializer()) * lrmul
    b = b.astype(x.dtype)
    if x.ndim == 2:
        return x + b
    return x + b.reshape((1, -1) + (1,) * (x.ndim - 2))


def dense(
    scope: Scope,
    x: jax.Array,
    fmaps: int,
    activation: str,
    lrmul: float = 1.0,
    param=None,
) -> jax.Array:
    """Fully connected layer without bias (reference ops.py:139-144)."""
    if x.ndim > 2:
        x = x.reshape((x.shape[0], -1))
    w = get_weight(scope, (x.shape[1], fmaps), activation, lrmul=lrmul, param=param)
    w = w.astype(x.dtype)
    return jnp.matmul(x, w, preferred_element_type=x.dtype)


def _conv_dimension_numbers(spatial_rank: int) -> lax.ConvDimensionNumbers:
    if spatial_rank == 2:
        return lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NCHW", "HWIO", "NCHW"))
    if spatial_rank == 3:
        return lax.conv_dimension_numbers(
            (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NCDHW", "DHWIO", "NCDHW")
        )
    raise ValueError(f"Unsupported spatial rank {spatial_rank}")


# 3D conv algorithm: "direct" (default) uses lax.conv_general_dilated;
# "gemm" lowers to per-offset channel GEMMs.  Measured on the v5e target
# (interleaved A/B, pgan xs @ 128x128x32 bf16, full WGAN-GP train step):
# the GEMM formulation is ~12x faster for the isolated forward conv but its
# autodiff backward (pad-transposes + fp32 accumulator traffic) loses to
# XLA's direct conv backward — full step 453 ms vs 297 ms.  Direct stays the
# default; the GEMM path remains selectable (SARAGAN_CONV3D=gemm) and is the
# building block for a future Pallas implicit-GEMM kernel with a custom
# backward.
CONV3D_ALGORITHM = os.environ.get("SARAGAN_CONV3D", "direct")

# f32 accumulation for pixel_norm / avg_pool statistics (the default, and
# jnp's implicit behavior for bf16 reductions).  SARAGAN_STATS_DTYPE=compute
# keeps those reductions in the compute dtype — required to fit phase-8
# (128x512x512) volumes on one chip, where the implicit full-res f32
# converts materialize at remat boundaries in 16x-padded layouts.
STATS_ACCUM_F32 = os.environ.get("SARAGAN_STATS_DTYPE", "f32") != "compute"

# avg_pool formulation: 'reshape' (default; reshape + mean over the split
# factor axes — fuses best at bench scales) or 'window' (lax.reduce_window;
# keeps big-phase tensors in natural spatial-minor layouts).
POOL_WINDOW = os.environ.get("SARAGAN_POOL", "reshape") == "window"


def _kernel_offsets(kd: int, kh: int, kw: int) -> jnp.ndarray:
    return jnp.array(
        [(i, j, k) for i in range(kd) for j in range(kh) for k in range(kw)], jnp.int32
    )


def _conv3d_shifted_gemm(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME NCDHW conv as a sum of kernel-offset channel contractions.

    y[n, f, z] = sum_{o in kernel offsets} x_pad[n, :, z + o] @ w[o]
    Each term is an (N*D*H*W, C) x (C, F) GEMM on the MXU.  The offsets run
    under lax.scan with ONE carried f32 accumulator — the unrolled form kept
    every per-offset 256 MB f32 partial live and blew HBM at the 128^2x32
    batch-8 config (measured: compile-time OOM, 16.4 G > 15.75 G).
    """
    n, c, d, h, w_sp = x.shape
    kd, kh, kw, _, f = w.shape
    t = d * h * w_sp
    # The contraction runs in FLAT (n, c, t) space: XLA:TPU gives 5D
    # conv-shaped dot operands/accumulators channels-minor layouts, and the
    # 128-lane tile pads the skinny channel dim (C=8 at the finest phase-8
    # blocks) 16x — a single f32 accumulator copy measured 32 GiB padded vs
    # 2.15 GiB unpadded and OOM'd phase 8 alone (BASELINE.md round 3).  With
    # t minor there is no padding; same contraction, same accumulation
    # order, exact.
    if kd * kh * kw == 1:
        if c <= 32 and f <= 32:
            # skinny 1x1 convs (to_rgb/from_rgb/fine-res residual skips) as
            # an elementwise multiply + f32-accumulated channel sum: a dot
            # with a sub-128 contraction forces channel-minor operand
            # layouts whose 128-lane tile pads 16x at C=8 (one such f32
            # reshape copy measured 32 GiB at phase 8, BASELINE.md round 3),
            # and the MXU would idle 15/16 of its lanes anyway.  VPU
            # mul-sum keeps every tensor in its natural spatial-minor
            # layout; products round to bf16 once (same as a dot's output
            # cast), accumulation stays f32.
            if c == 1:
                # from_rgb: a reduce over a size-1 axis still makes XLA
                # treat the input as a dot-style operand (measured: the
                # 1-channel stacked critic input drew a stack/channel-minor
                # layout padded 128x to 16 GiB at phase 8) — a pure
                # broadcast multiply has no layout demands at all
                y = x.reshape(n, 1, t) * w[0, 0, 0].reshape(1, f, 1).astype(x.dtype)
                return y.reshape(n, f, d, h, w_sp)
            xf = x.reshape(n, c, 1, t)
            wf = w[0, 0, 0].reshape(1, c, f, 1).astype(x.dtype)
            # cast BEFORE the 5D reshape: a full-res f32 5D tensor draws a
            # channel-minor remat copy (16x lane pad, 32 GiB measured)
            acc_dt = jnp.float32 if STATS_ACCUM_F32 else x.dtype
            y = jnp.sum(xf * wf, axis=1, dtype=acc_dt).astype(x.dtype)
            return y.reshape(n, f, d, h, w_sp)
        y = jnp.einsum(
            "nct,cf->nft", x.reshape(n, c, t), w[0, 0, 0],
            preferred_element_type=jnp.float32,
        )
        return y.astype(x.dtype).reshape(n, f, d, h, w_sp)
    pd, ph, pw = kd // 2, kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pd, kd - 1 - pd), (ph, kh - 1 - ph), (pw, kw - 1 - pw)))
    offsets = _kernel_offsets(kd, kh, kw)
    w_flat = w.reshape(kd * kh * kw, c, f)

    def body(acc, ow):
        o, wk = ow
        xs = lax.dynamic_slice(xp, (0, 0, o[0], o[1], o[2]), (n, c, d, h, w_sp))
        acc = acc + jnp.einsum(
            "nct,cf->nft", xs.reshape(n, c, t), wk, preferred_element_type=jnp.float32
        )
        return acc, None

    acc0 = jnp.zeros((n, f, t), jnp.float32)
    acc, _ = lax.scan(body, acc0, (offsets, w_flat))
    return acc.astype(x.dtype).reshape(n, f, d, h, w_sp)


def conv(
    scope: Scope,
    x: jax.Array,
    fmaps: int,
    kernel: Sequence[int],
    activation: str,
    param=None,
    lrmul: float = 1.0,
) -> jax.Array:
    """SAME conv over NC(D)HW with (*kernel, in, out) weights
    (reference ops.py:147-150 for 3D, SURFGAN_2D ops.py:98-101 for 2D)."""
    spatial_rank = x.ndim - 2
    kernel = tuple(int(k) for k in kernel)
    assert len(kernel) == spatial_rank, (kernel, x.shape)
    w = get_weight(scope, (*kernel, x.shape[1], fmaps), activation, param=param, lrmul=lrmul)
    w = w.astype(x.dtype)
    return conv_apply(x, w)


def _conv_direct(x: jax.Array, w: jax.Array) -> jax.Array:
    spatial_rank = x.ndim - 2
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,) * spatial_rank,
        padding="SAME",
        dimension_numbers=_conv_dimension_numbers(spatial_rank),
        preferred_element_type=x.dtype,
    )


@jax.custom_jvp
def _conv3d_hybrid(x: jax.Array, w: jax.Array) -> jax.Array:
    """Hybrid conv3d: shifted-GEMM primal (fast forward on this target) with
    direct-conv tangents, so reverse-mode transposes to XLA's native conv
    backward (which beat the GEMM formulation's autodiff backward in the
    hardware A/B — see CONV3D_ALGORITHM note)."""
    return _conv3d_shifted_gemm(x, w)


@_conv3d_hybrid.defjvp
def _conv3d_hybrid_jvp(primals, tangents):
    x, w = primals
    dx, dw = tangents
    y = _conv3d_hybrid(x, w)
    dy = _conv_direct(dx, w) + _conv_direct(x, dw)
    return y, dy


# ---------------------------------------------------------------------------
# Custom-VJP conv3d: hand-written dgrad/wgrad, differentiable to any order
# ---------------------------------------------------------------------------
#
# The WGAN-GP loss differentiates the discriminator's input-gradient, so the
# conv must support grad-of-grad.  jax.custom_vjp alone blocks higher-order
# AD *through the custom function*, but the derivative algebra of
# correlation closes on itself:
#
#   C(x, w)[n,f,s] = sum_o sum_c x[n,c,s+o] * w[o,c,f]      (the conv)
#   W(x, dy)[o,c,f] = sum_{n,s} x[n,c,s+o] * dy[n,f,s]      (the wgrad)
#
#   dC/dx^T u = C(u, fs(w));   dC/dw^T u = W(x, u)
#   dW/dx^T v = C(dy, fs(v));  dW/ddy^T v = C(x, v)
#
# with fs(w)[o,f,c] = w[-o,c,f] (spatial flip + io swap, an involution).
# Defining BOTH C and W as custom_vjp functions whose backwards call only
# C, W and fs therefore yields correct derivatives of EVERY order — each
# differentiation level re-enters the same two fast kernels instead of
# XLA's autodiff transpose of the forward graph (whose pad-transposes made
# the round-1 shifted-GEMM backward lose; see CONV3D_ALGORITHM note).
#
# SARAGAN_CONV3D=gemm_custom selects this path; SARAGAN_CONV3D_WGRAD picks
# the wgrad engine: 'xla' (transpose of the native conv, default) or
# 'einsum' (27 explicit channel-GEMMs).


def _flip_swap(w: jax.Array) -> jax.Array:
    """fs(w): flip all spatial kernel axes, swap the io channel axes."""
    spatial_axes = tuple(range(w.ndim - 2))
    return jnp.swapaxes(jnp.flip(w, axis=spatial_axes), -2, -1)


def _wgrad_einsum(x: jax.Array, dy: jax.Array, kernel: Tuple[int, ...]) -> jax.Array:
    """dw[o,c,f] = sum_{n,s} x[n,c,s+o] dy[n,f,s]: one (C,NS)x(NS,F) GEMM
    per offset, offsets scanned (single live x-slice)."""
    n, c, d, h, w_sp = x.shape
    kd, kh, kw = kernel
    f = dy.shape[1]
    pd, ph, pw = kd // 2, kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pd, kd - 1 - pd), (ph, kh - 1 - ph), (pw, kw - 1 - pw)))
    offsets = _kernel_offsets(kd, kh, kw)

    def body(_, o):
        xs = lax.dynamic_slice(xp, (0, 0, o[0], o[1], o[2]), (n, c, d, h, w_sp))
        return None, jnp.einsum("ncdhw,nfdhw->cf", xs, dy, preferred_element_type=jnp.float32)

    _, rows = lax.scan(body, None, offsets)
    return rows.reshape(kd, kh, kw, c, f).astype(x.dtype)


def _wgrad_xla(x: jax.Array, dy: jax.Array, kernel: Tuple[int, ...]) -> jax.Array:
    """Same contraction through XLA's native conv-wgrad tiling: the conv is
    linear in w, so its vjp at w=0 is exactly W(x, dy)."""
    kshape = (*kernel, x.shape[1], dy.shape[1])
    _, vjp = jax.vjp(lambda w: _conv_direct(x, w), jnp.zeros(kshape, x.dtype))
    (dw,) = vjp(dy)
    return dw


def _conv3d_engine(x: jax.Array, w: jax.Array) -> jax.Array:
    """Engine behind the custom-VJP algebra: 'pallas' = implicit-GEMM kernel
    with in-VMEM offset reuse, 'pallas2' = the manual double-buffered-DMA
    im2col variant (fwd/dgrad only; wgrad shares the v1 kernel) — both in
    ops/pallas_conv.py; else the scan GEMM."""
    if CONV3D_ALGORITHM == "pallas" and w.shape[0] * w.shape[1] * w.shape[2] > 1:
        from saragan_tpu.ops.pallas_conv import conv3d_flat

        return conv3d_flat(x, w)
    if CONV3D_ALGORITHM == "pallas2" and w.shape[0] * w.shape[1] * w.shape[2] > 1:
        from saragan_tpu.ops.pallas_conv import conv3d_flat_v2

        return conv3d_flat_v2(x, w)
    return _conv3d_shifted_gemm(x, w)


@jax.custom_vjp
def _conv3d_C(x: jax.Array, w: jax.Array) -> jax.Array:
    return _conv3d_engine(x, w)


def _conv3d_C_fwd(x, w):
    return _conv3d_C(x, w), (x, w)


def _conv3d_C_bwd(res, dy):
    x, w = res
    dx = _conv3d_C(dy, _flip_swap(w))
    dw = _conv3d_W(x, dy, w.shape[:3])
    return dx, dw


_conv3d_C.defvjp(_conv3d_C_fwd, _conv3d_C_bwd)


def _wgrad_mulsum_1x1(x: jax.Array, dy: jax.Array) -> jax.Array:
    """1x1 wgrad dw[c,f] = sum_{n,s} x[n,c,s] dy[n,f,s] as a broadcast
    multiply + reduction: the native/einsum wgrad is a dot whose free dims
    are the channels, so XLA demands channel-minor operand layouts — at
    phase 8 the 128-lane tile pads the C=1/C=8 full-res operands 256x/32x
    to 16 GiB each (measured, BASELINE.md round 3).  Elementwise+reduce has
    no layout demands; only used for skinny channel counts where the MXU
    had nothing to win anyway."""
    n, c = x.shape[:2]
    f = dy.shape[1]
    t = 1
    for s in x.shape[2:]:
        t *= s
    xf = x.reshape(n, c, 1, t)
    dyf = dy.reshape(n, 1, f, t)
    acc_dt = jnp.float32 if STATS_ACCUM_F32 else x.dtype
    dw = jnp.sum(xf * dyf, axis=(0, 3), dtype=acc_dt)  # (c, f)
    return dw.astype(x.dtype).reshape((1,) * (x.ndim - 2) + (c, f))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv3d_W(x: jax.Array, dy: jax.Array, kernel: Tuple[int, ...]) -> jax.Array:
    if int(np.prod(kernel)) == 1 and x.shape[1] <= 32 and dy.shape[1] <= 32:
        return _wgrad_mulsum_1x1(x, dy)
    if CONV3D_ALGORITHM == "pallas" and int(np.prod(kernel)) > 1:
        from saragan_tpu.ops.pallas_conv import conv3d_flat_wgrad

        return conv3d_flat_wgrad(x, dy, tuple(kernel))
    if os.environ.get("SARAGAN_CONV3D_WGRAD", "xla") == "einsum":
        return _wgrad_einsum(x, dy, kernel)
    return _wgrad_xla(x, dy, kernel)


def _conv3d_W_fwd(x, dy, kernel):
    return _conv3d_W(x, dy, kernel), (x, dy)


def _conv3d_W_bwd(kernel, res, uw):
    x, dy = res
    dx = _conv3d_C(dy, _flip_swap(uw))
    ddy = _conv3d_C(x, uw)
    return dx, ddy


_conv3d_W.defvjp(_conv3d_W_fwd, _conv3d_W_bwd)


# ---------------------------------------------------------------------------
# Space-to-depth channel packing (SARAGAN_CONV3D=s2d)
# ---------------------------------------------------------------------------
#
# The one exact conv formulation the BASELINE.md:779 lane-closure argument
# does not cover: that argument shows no matmul reformulation can beat the
# F/128-lane MXU ceiling "without batching output channels that do not
# exist" — folding 2x2x2 spatial blocks into channels MANUFACTURES those
# channels (C -> 8C contraction, F -> 8F lanes), and shrinks each spatial
# dim 2x (the C=8 full-res tensors whose channel-on-lanes layouts XLA pads
# 16-256x at phases 7-8 become C=64 tensors padded 2x).  The rewrite is
# exact: conv and space-to-depth are both linear, and a SAME stride-1 conv
# on the unfolded tensor equals a conv on the folded tensor with a
# block-structured folded kernel (derivation in _s2d_fold_kernel).  Cost:
# the folded kernel is 8x larger with exactly 1/8 non-zeros, so the MXU
# does 8x the nominal madds at 8x the lane occupancy — neutral in the
# madd-ceiling, but it trades the layout/padding walls for dense tiles.
# Autodiff flows through reshape/transpose/einsum/conv, so first- and
# second-order (WGAN-GP) gradients are exact (pinned in tests/test_s2d.py).


_S2D_MAX_CIN = int(os.environ.get("SARAGAN_S2D_MAX_CIN", "16"))


def _s2d_fold(x: jax.Array, f: int = 2) -> jax.Array:
    """NCDHW -> (N, C*f^3, D/f, H/f, W/f); folded channel = c*f^3 +
    (pz*f^2 + py*f + px) with p the within-block phase (phase-minor)."""
    n, c, d, h, w = x.shape
    x = x.reshape(n, c, d // f, f, h // f, f, w // f, f)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(n, c * f**3, d // f, h // f, w // f)


def _s2d_unfold(y: jax.Array, f: int = 2) -> jax.Array:
    """Inverse of _s2d_fold."""
    n, cf, db, hb, wb = y.shape
    c = cf // f**3
    y = y.reshape(n, c, f, f, f, db, hb, wb)
    y = y.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return y.reshape(n, c, db * f, hb * f, wb * f)


@functools.lru_cache(maxsize=None)
def _s2d_expansion(k: int, f: int) -> tuple:
    """Per-dim folded-kernel expansion tensor E and folded padding.

    1D derivation (pad = k//2): the SAME conv reads, for output z = f*zb+p,
    input x[f*zb + p + dz - pad].  Writing p + dz - pad = f*q + r with
    r in [0,f) gives the folded tap index q = floor((p+dz-pad)/f), so
    E[j, p, r, dz] = 1  iff  dz == f*(j+q_min) + r - p + pad,
    with q in [q_min, q_max] spanning every (p, dz) pair.  The folded conv
    then needs explicit padding (-q_min, q_max) zero blocks — exact,
    because an all-zero folded block is the fold of f original zero rows
    (the SAME padding the unfolded conv sees)."""
    pad = k // 2
    vals = [p + dz - pad for p in range(f) for dz in range(k)]
    q_min = min(v // f for v in vals)
    q_max = max(v // f for v in vals)
    kq = q_max - q_min + 1
    e = np.zeros((kq, f, f, k), np.float32)
    for j in range(kq):
        for p in range(f):
            for r in range(f):
                dz = f * (j + q_min) + r - p + pad
                if 0 <= dz < k:
                    e[j, p, r, dz] = 1.0
    return e, (-q_min, q_max)


def _s2d_fold_weight(w: jax.Array, f: int = 2):
    """(kd,kh,kw,C,F) -> folded (kqd,kqh,kqw, C*f^3, F*f^3) + padding."""
    kd, kh, kw, c, fo = w.shape
    ed, pad_d = _s2d_expansion(kd, f)
    eh, pad_h = _s2d_expansion(kh, f)
    ew, pad_w = _s2d_expansion(kw, f)
    wf = jnp.einsum(
        "aprd,bqse,gtuh,dehio->abgirsuopqt",
        jnp.asarray(ed, w.dtype), jnp.asarray(eh, w.dtype),
        jnp.asarray(ew, w.dtype), w,
    )
    wf = wf.reshape(ed.shape[0], eh.shape[0], ew.shape[0], c * f**3, fo * f**3)
    return wf, (pad_d, pad_h, pad_w)


def _conv3d_s2d(x: jax.Array, w: jax.Array, f: int = 2) -> jax.Array:
    """conv(x, w) == unfold(conv_folded(fold(x), fold_weight(w))), exact."""
    xf = _s2d_fold(x, f)
    wf, pads = _s2d_fold_weight(w, f)
    y = lax.conv_general_dilated(
        xf,
        wf,
        window_strides=(1, 1, 1),
        padding=list(pads),
        dimension_numbers=_conv_dimension_numbers(3),
        preferred_element_type=x.dtype,
    )
    return _s2d_unfold(y, f)


def _s2d_applicable(x: jax.Array, w: jax.Array) -> bool:
    return (
        w.shape[0] * w.shape[1] * w.shape[2] > 1  # 1x1x1 gains nothing
        and x.shape[1] <= _S2D_MAX_CIN  # folded C fits 128 lanes
        and all(s % 2 == 0 for s in x.shape[2:])  # even spatial dims
    )


def conv_apply(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME stride-1 conv on explicit weights, algorithm-selected."""
    spatial_rank = x.ndim - 2
    if spatial_rank == 3 and CONV3D_ALGORITHM == "gemm":
        return _conv3d_shifted_gemm(x, w)
    if spatial_rank == 3 and CONV3D_ALGORITHM in ("gemm_custom", "pallas"):
        return _conv3d_C(x, w)
    if spatial_rank == 3 and CONV3D_ALGORITHM == "hybrid" and w.shape[0] * w.shape[1] * w.shape[2] > 1:
        return _conv3d_hybrid(x, w)
    if spatial_rank == 3 and CONV3D_ALGORITHM == "s2d" and _s2d_applicable(x, w):
        return _conv3d_s2d(x, w)
    return _conv_direct(x, w)


conv2d = conv
conv3d = conv


def group_conv(x: jax.Array, w: jax.Array, groups: int) -> jax.Array:
    """Grouped SAME conv (reference ops.py:153-164 splits/concats manually;
    lax supports feature_group_count natively — one fused op).

    w: (*kernel, in_per_group, out_total)."""
    spatial_rank = x.ndim - 2
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,) * spatial_rank,
        padding="SAME",
        dimension_numbers=_conv_dimension_numbers(spatial_rank),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )


def depthwise_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """Depthwise conv (reference conv3d_depthwise, ops.py:351-355):
    one filter per input channel. w: (*kernel, 1, C)."""
    return group_conv(x, w, groups=x.shape[1])


def spectral_normalize(w: jax.Array, u: jax.Array, iterations: int = 1, eps: float = 1e-12):
    """Spectral normalization by power iteration (reference ops.py:80-108).

    Functional: takes and returns the power-iteration vector `u` (the
    reference stores it as a non-trainable variable). Returns (w / sigma,
    u_new); gradients do not flow through u/v (stop_gradient, matching the
    reference).
    """
    w_mat = w.reshape(-1, w.shape[-1])

    def l2n(v):
        return v / (jnp.linalg.norm(v) + eps)

    u_hat = u
    v_hat = None
    for _ in range(iterations):
        v_hat = l2n(u_hat @ w_mat.T)
        u_hat = l2n(v_hat @ w_mat)
    u_hat = lax.stop_gradient(u_hat)
    v_hat = lax.stop_gradient(v_hat)
    sigma = (v_hat @ w_mat) @ u_hat.T
    return (w_mat / sigma).reshape(w.shape), u_hat


def refresh_spectral_u(params: dict, iterations: int = 1, eps: float = 1e-12) -> dict:
    """Power-iterate every persisted `*_u` vector against its current weight.

    The functional analog of the reference's per-step assignment to the
    non-trainable `u` variable (ops.py:96-104): called once per train step
    (after the weight update), so `u` converges to the dominant singular
    vector over training instead of restarting from its initialization each
    forward.  Scaling w by the equalized-LR runtime coefficient does not
    change singular vectors, so iterating on the raw stored variable is
    exact."""
    out = dict(params)
    for k, u in params.items():
        if not k.endswith("_u"):
            continue
        wk = k[:-2]
        if wk not in params:
            continue
        w_mat = params[wk].reshape(-1, params[wk].shape[-1])

        def l2n(v):
            return v / (jnp.linalg.norm(v) + eps)

        for _ in range(iterations):
            v = l2n(u @ w_mat.T)
            u = l2n(v @ w_mat)
        out[k] = lax.stop_gradient(u)
    return out


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def leaky_relu(x: jax.Array, alpha_lr: float = 0.2) -> jax.Array:
    """Leaky ReLU. Autodiff yields the reference's hand-written first- and
    second-order gradients (ops.py:167-182) exactly; verified in tests."""
    alpha_lr = jnp.asarray(alpha_lr, x.dtype)
    return jnp.where(x >= 0, x, x * alpha_lr)


def act(x: jax.Array, activation: str, param=None) -> jax.Array:
    if activation == "leaky_relu":
        assert param is not None
        return leaky_relu(x, alpha_lr=param)
    if activation == "linear":
        return x
    raise ValueError(f"Unknown activation {activation}")


# ---------------------------------------------------------------------------
# Resampling (nearest up / average down), rank-generic
# ---------------------------------------------------------------------------


def avg_unpool(x: jax.Array, factor: int = 2, gain: float = 1.0) -> jax.Array:
    """Nearest-neighbour upsampling of all spatial axes (reference
    ops.py:250-262 implements this with a batch_to_space trick; repeat is the
    identical map and XLA lowers it to a broadcast-reshape, no gather)."""
    if gain != 1:
        x = x * gain
    if factor == 1:
        return x
    for axis in range(2, x.ndim):
        x = jnp.repeat(x, factor, axis=axis)
    return x


def avg_pool(x: jax.Array, factor: int = 2, gain: float = 1.0) -> jax.Array:
    """Average pooling of all spatial axes (reference ops.py:265-273).

    Implemented as reshape+mean: for stride==window pooling this is the same
    computation as reduce_window but fuses better on TPU (pure reshape is a
    relayout; the mean reduces over contiguous minor dims).
    """
    if gain != 1:
        x = x * gain
    if factor == 1:
        return x
    spatial = x.shape[2:]
    assert all(s % factor == 0 for s in spatial), (x.shape, factor)
    if POOL_WINDOW:
        # reduce_window formulation: same computation, but the operand
        # keeps its natural 5D spatial-minor layout — the reshape-split
        # form's interleaved factor axes draw transposed layouts whose
        # padding blows up at phase-8 sizes (SARAGAN_POOL=window;
        # see STATS_ACCUM_F32 note)
        dims = (1, 1) + (factor,) * len(spatial)
        # accumulation dtype must match the reshape path below: the default
        # mean (no dtype kw) sums bf16 inputs in f32
        acc_dt = jnp.float32 if STATS_ACCUM_F32 else x.dtype
        xa = x.astype(acc_dt)
        # init must be a LITERAL zero for jax to route to the transposable
        # reduce-window-sum primitive (a traced init falls back to the
        # generic reduce_window, which has no reverse-mode rule)
        summed = lax.reduce_window(xa, xa.dtype.type(0), lax.add, dims, dims, "VALID")
        return (summed / jnp.asarray(factor ** len(spatial), acc_dt)).astype(x.dtype)
    new_shape: Tuple[int, ...] = x.shape[:2]
    reduce_axes = []
    for i, s in enumerate(spatial):
        new_shape = new_shape + (s // factor, factor)
        reduce_axes.append(2 + 2 * i + 1)
    x = x.reshape(new_shape)
    # dtype: see pixel_norm — jnp.mean's silent bf16->f32 upcast is a
    # materialized full-res convert under remat at the big phases
    kw = {} if STATS_ACCUM_F32 else {"dtype": x.dtype}
    return x.mean(axis=tuple(reduce_axes), **kw)


def upscale(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest upsample. The reference defines its VJP as sum-pool and its
    second-order VJP as nearest-upsample again (ops.py:276-289) — identical
    to autodiff of `jnp.repeat`."""
    return avg_unpool(x, factor)


def _box_sum(arr: jax.Array, axis: int) -> jax.Array:
    """Per-dim kernel box-sum: w'[j] = w[j-1] + w[j] (length k+1, OOB = 0)."""
    z = jnp.zeros_like(lax.slice_in_dim(arr, 0, 1, axis=axis))
    shifted = jnp.concatenate([z, arr], axis=axis)  # w[j-1] terms
    padded = jnp.concatenate([arr, z], axis=axis)  # w[j] terms
    return shifted + padded  # length k+1


def upscale_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """Fused nearest-2x-upscale + SAME conv: conv(repeat(x), w), computed
    WITHOUT materializing the upscaled activation.

    Because repeat and conv are both linear they fuse exactly:
    repeat(x) = zero-dilate(x) ⊛ ones(2)^d, so
    conv(repeat(x), w) = transposed-conv(x, w ⊛ ones(2)^d) — one
    lhs_dilated conv with the per-dim box-summed kernel (size k+1), reading
    x at coarse resolution.  3.4x fewer madds than conv-after-repeat for
    k=3 (2^3 taps/voxel vs 27) when the lowering skips dilation zeros.

    w: (*kernel, in, out), odd kernel. Output: fine resolution, SAME-aligned
    with conv(repeat(x), w) exactly (validated in tests incl. grads).
    """
    spatial_rank = x.ndim - 2
    kernel = w.shape[:spatial_rank]

    wp = w
    for axis in range(spatial_rank):
        wp = _box_sum(wp, axis)

    # Alignment (1D, odd k, h = (k-1)/2): SAME conv over repeat(x) gives
    # y[o] = sum_c x[c] * w'[2c + 1 + h - o]; an lhs_dilation=2 correlation
    # with padding pl satisfies out[o] = sum_c x[c] * w'[2c - o + pl], so
    # pl = h + 1 = (k+1)/2, and output length 2n requires ph = (k+1)/2 too.
    dn = _conv_dimension_numbers(spatial_rank)
    pads = [((kk + 1) // 2, (kk + 1) // 2) for kk in kernel]
    return lax.conv_general_dilated(
        x,
        wp.astype(x.dtype),
        window_strides=(1,) * spatial_rank,
        padding=pads,
        lhs_dilation=(2,) * spatial_rank,
        dimension_numbers=dn,
        preferred_element_type=x.dtype,
    )


def conv_downscale(x: jax.Array, w: jax.Array) -> jax.Array:
    """Fused SAME conv + 2x average-pool: downscale(conv(x, w)) computed as
    ONE stride-2 conv with the box-averaged (k+1)^d kernel — the mirror of
    `upscale_conv`, same linearity argument:

        pool2(conv(x, w))[p] = (1/2^d) sum_{s in {0,1}^d} conv(x, w)[2p+s]
                             = conv_{stride 2}(x, w')[p],
        w'[m] = (1/2^d) sum_s w[m - s]   (per-dim box-sum / 2, length k+1)

    with per-dim padding ((k-1)/2, (k-1)/2).  3.4x fewer madds than
    conv-then-pool for k=3 in 3D (64 taps at coarse vs 27 at fine res).

    NOTE on applicability (round-3 settled verdict, BASELINE.md): in the
    reference's discriminators the pattern is conv -> bias -> LEAKY_RELU ->
    downscale3d in every family (e.g. pgan discriminator.py:36-45), and the
    nonlinearity does not commute with the pool, so this fusion is exact in
    the model ONLY for linear-activation conv blocks (bias DOES commute:
    avg(x + b) = avg(x) + b).  The 1x1 adjacencies that do exist
    (from_rgb(downscale(x)), residual shortcuts) commute with the pool
    outright and are already ordered pool-first.  The op is therefore NOT
    wired into any family — it stays an exported, oracle/grad/2nd-order-
    tested building block for linear-activation D blocks a user may add.
    """
    spatial_rank = x.ndim - 2
    kernel = w.shape[:spatial_rank]
    wp = w
    for axis in range(spatial_rank):
        wp = _box_sum(wp, axis)
    wp = wp * (0.5**spatial_rank)
    pads = [((kk - 1) // 2, (kk - 1) // 2) for kk in kernel]
    return lax.conv_general_dilated(
        x,
        wp.astype(x.dtype),
        window_strides=(2,) * spatial_rank,
        padding=pads,
        dimension_numbers=_conv_dimension_numbers(spatial_rank),
        preferred_element_type=x.dtype,
    )


def downscale(x: jax.Array, factor: int = 2) -> jax.Array:
    """Average pool. Reference VJP: (1/factor**n)-scaled nearest upsample,
    second order: avg-pool again (ops.py:292-305) — identical to autodiff."""
    return avg_pool(x, factor)


upscale2d = upscale
upscale3d = upscale
downscale2d = downscale
downscale3d = downscale


# ---------------------------------------------------------------------------
# Normalization / statistics layers
# ---------------------------------------------------------------------------


def pixel_norm(x: jax.Array, epsilon: float = 1e-8) -> jax.Array:
    """Per-voxel channel normalization (reference ops.py:308-310).

    jnp.mean silently upcasts bf16 inputs to f32 (a full-res f32
    convert_element_type): fused away in the hot path, but remat boundaries
    materialize it, and XLA gives it a channel-minor layout whose 128-lane
    tile pads C=8 finest-phase tensors 16x (= the round-2 17.7 GB
    convolution_select_fusion OOM at phase 8, BASELINE.md).
    SARAGAN_STATS_DTYPE=compute keeps the reduction in x.dtype for the
    big-volume path; default stays the f32-accumulated form."""
    eps = jnp.asarray(epsilon, x.dtype)
    kw = {} if STATS_ACCUM_F32 else {"dtype": x.dtype}
    return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True, **kw) + eps)


def minibatch_stddev_layer(x: jax.Array, group_size: int = 4) -> jax.Array:
    """Append a per-group stddev statistic channel (reference ops.py:313-325).

    Statistics are computed in float32 regardless of the compute dtype, as in
    the reference (ops.py:318).
    """
    n = x.shape[0]
    group_size = min(group_size, n)
    # The reference reshapes [G, -1, C, *S]; this requires n % group_size == 0.
    assert n % group_size == 0, (n, group_size)
    s = x.shape
    y = x.reshape((group_size, -1) + s[1:]).astype(jnp.float32)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=tuple(range(1, y.ndim)), keepdims=True)  # [n/G, 1, 1, ...]
    y = y.astype(x.dtype)
    reps = (group_size, 1) + s[2:]
    y = jnp.tile(y, reps)
    return jnp.concatenate([x, y], axis=1)


def instance_norm(x: jax.Array, epsilon: float = 1e-8) -> jax.Array:
    """Per-sample, per-channel spatial normalization (reference ops.py:328-333)."""
    assert x.ndim >= 4
    axes = tuple(range(2, x.ndim))
    x = x - jnp.mean(x, axis=axes, keepdims=True)
    eps = jnp.asarray(epsilon, x.dtype)
    x = x * lax.rsqrt(jnp.mean(jnp.square(x), axis=axes, keepdims=True) + eps)
    return x


def apply_noise(scope: Scope, x: jax.Array, rng: jax.Array) -> jax.Array:
    """Learned-strength per-pixel noise (reference ops.py:336-341)."""
    noise_shape = (x.shape[0], 1) + x.shape[2:]
    noise = jax.random.normal(rng, noise_shape, x.dtype)
    strength = scope.get("noise_strength", (), zeros_initializer()).astype(x.dtype)
    return x + noise * strength


def style_mod(scope: Scope, x: jax.Array, dlatent: jax.Array, activation: str, param=None):
    """AdaIN-style modulation (reference ops.py:344-348)."""
    s = scope.sub("style_mod")
    style = apply_bias(s, dense(s, dlatent, fmaps=x.shape[1] * 2, activation=activation, param=param))
    style = style.reshape((-1, 2, x.shape[1]) + (1,) * (x.ndim - 2))
    return x * (style[:, 0] + 1) + style[:, 1]


# ---------------------------------------------------------------------------
# RGB adapters
# ---------------------------------------------------------------------------


def to_rgb(scope: Scope, x: jax.Array, channels: int = 1) -> jax.Array:
    """1x1(x1) linear projection to image channels (reference ops.py:239-240)."""
    kernel = (1,) * (x.ndim - 2)
    return apply_bias(scope, conv(scope, x, channels, kernel, activation="linear"))


def from_rgb(scope: Scope, x: jax.Array, filters_out: int, activation: str, param=None):
    """1x1(x1) lift from image channels (reference ops.py:243-247)."""
    kernel = (1,) * (x.ndim - 2)
    x = conv(scope, x, filters_out, kernel, activation, param)
    x = apply_bias(scope, x)
    x = act(x, activation, param=param)
    return x


# ---------------------------------------------------------------------------
# Schedules and sizing helpers
# ---------------------------------------------------------------------------


def alpha_update(
    alpha: jax.Array,
    mixing_nimg: int,
    starting_alpha: float,
    batch_size: int,
    global_size: int,
) -> jax.Array:
    """One mixing-phase alpha step: linear decay 1 -> 0 (reference ops.py:4-23).

    num_steps floors at 1 so a mixing budget smaller than one global batch
    (possible under HPO-sampled batch sizes) fades in a single step instead
    of dividing by zero; the trainer's schedule (trainer.py) uses the same
    guard."""
    if mixing_nimg == 0:
        return jnp.zeros_like(alpha)
    num_steps = max(1, mixing_nimg // (batch_size * global_size))
    step = starting_alpha / num_steps
    return jnp.maximum(alpha - step, 0.0)


def get_kernel(x_shape: Sequence[int], desired_k_shape: Sequence[int]) -> list:
    """Shrink a desired kernel to the largest odd kernel fitting x
    (reference ops.py:31-58)."""
    assert len(x_shape) == len(desired_k_shape)
    kernel = []
    for x_i, k_i in zip(x_shape, desired_k_shape):
        if x_i < k_i:
            kernel.append(x_i - 1 if x_i % 2 == 0 else x_i)
        else:
            kernel.append(k_i)
    return kernel


_FILTER_LISTS_3D = {
    "xxs": [256, 256, 64, 32, 16, 8, 4, 2],
    "xs": [256, 256, 64, 64, 32, 16, 8, 4],
    "s": [512, 512, 128, 128, 64, 32, 16, 8],
    "m": [1024, 1024, 256, 256, 128, 64, 32, 16],
    "l": [2048, 2048, 512, 512, 256, 128, 64, 32],
    "xl": [4096, 4096, 1024, 1024, 512, 256, 128, 64],
    "xxl": [8192, 8192, 2048, 1024, 1024, 512, 256, 128],
}


def num_filters(
    phase: int,
    num_phases: int,
    base_shape: Sequence[int],
    base_dim: Optional[int] = None,
    size: Optional[str] = None,
) -> int:
    """Voxel-count-based filter sizing (reference ops.py:201-236).

    The filter lists were designed for spatial sizes whose log2-voxel-count is
    4, 7, 10, ...; the current phase's voxel count is snapped to the nearest
    reference point.
    """
    if size not in _FILTER_LISTS_3D:
        raise ValueError(f"Unknown size: {size}")
    filter_list = _FILTER_LISTS_3D[size]
    assert len(filter_list) == 8, "Filter lists are built for LIDC-IDRI dataset."
    current_dim = [2 ** (phase - 1) * dim for dim in base_shape[1:]]
    log_product = np.log2(np.prod(current_dim))
    reference_log = np.array([4 + n * 3 for n in range(7)])
    index = int(np.argmin(np.abs(reference_log - log_product)))
    return filter_list[index]


_FILTER_LISTS_2D = {
    "xxs": [64, 64, 64, 64, 64, 64, 64, 64, 32, 16, 8, 4, 2],
    "xs": [128, 128, 128, 128, 128, 128, 128, 128, 64, 32, 16, 8, 4],
    "s": [256, 256, 256, 256, 256, 256, 256, 256, 128, 64, 32, 16, 8],
    "m": [512, 512, 512, 512, 512, 512, 512, 512, 256, 128, 64, 32, 16],
    "l": [512, 512, 512, 512, 512, 512, 512, 512, 512, 256, 128, 64, 32],
    "xl": [1024, 1024, 1024, 1024, 1024, 1024, 1024, 1024, 1024, 512, 256, 128, 64],
    "xxl": [2048, 2048, 2048, 2048, 2048, 2048, 2048, 2048, 2048, 1024, 512, 256, 128],
}


def num_filters_2d(phase: int, num_phases: int, base_dim=None, size: Optional[str] = None) -> int:
    """2D filter sizing (reference SURFGAN_2D/networks/ops.py:139-158)."""
    if size not in _FILTER_LISTS_2D:
        raise ValueError(f"Unknown size: {size}")
    filter_list = _FILTER_LISTS_2D[size][-num_phases:]
    return filter_list[phase - 1]
