"""Pallas implicit-GEMM conv3d engine (VERDICT r1 item 4).

The one formulation round-2 measurements left untested: per-offset channel
GEMMs with the input tile resident in VMEM, so all K=kd*kh*kw offset reads
reuse ONE HBM fetch (the jnp scan re-read x from HBM per offset and lost
4.8x; the unrolled form OOM'd — BASELINE.md round-2 table).

Layout trick: flatten the zero-PADDED volume to 1D.  For output position at
padded-flat index p, the (kd,kh,kw) tap lives at p + delta with
delta = (kd-ctr)*Sp + (kh-ctr)*Wp + (kw-ctr), Sp=(H+pad)*(W+pad), Wp=W+pad —
every tap is a pure LANE SHIFT of the same flattened buffer.  The kernel
computes y for ALL padded positions (a few % waste) and multiplies by an
interior mask, so the output comes back in the same flat-padded space and a
single slice/reshape restores NCDHW.

Used as the engine inside ops.core._conv3d_C/_conv3d_W (the custom-VJP
derivative algebra), selected with SARAGAN_CONV3D=pallas.  Runs compiled on
TPU, interpret-mode elsewhere (CPU tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _geometry(spatial: Tuple[int, int, int], kernel: Tuple[int, int, int]):
    """Padded-flat geometry shared by fwd/dgrad/wgrad."""
    d, h, w = spatial
    kd, kh, kw = kernel
    pd, ph, pw = kd // 2, kh // 2, kw // 2
    dp, hp, wp = d + 2 * pd, h + 2 * ph, w + 2 * pw
    sp = hp * wp
    t_p = dp * sp
    deltas = [
        (i - pd) * sp + (j - ph) * wp + (k - pw)
        for i in range(kd)
        for j in range(kh)
        for k in range(kw)
    ]
    halo = max(abs(min(deltas)), abs(max(deltas)))
    halo_pad = _round_up(max(halo, 1), 128)
    # tile: one padded plane's worth, rounded to lanes; at least 1024
    t_tile = max(_round_up(min(sp, 4096), 128), 1024)
    t_rounded = _round_up(t_p, t_tile)
    return dict(
        pd=pd, ph=ph, pw=pw, dp=dp, hp=hp, wp=wp, sp=sp, t_p=t_p,
        deltas=deltas, halo_pad=halo_pad, t_tile=t_tile, t_rounded=t_rounded,
    )


def _to_flat(x: jax.Array, g) -> jax.Array:
    """(N, C, D, H, W) -> (N, C, halo + t_rounded + halo) zero-embedded."""
    n, c = x.shape[:2]
    xp = jnp.pad(
        x,
        ((0, 0), (0, 0), (g["pd"], g["pd"]), (g["ph"], g["ph"]), (g["pw"], g["pw"])),
    ).reshape(n, c, g["t_p"])
    return jnp.pad(
        xp, ((0, 0), (0, 0), (g["halo_pad"], g["halo_pad"] + g["t_rounded"] - g["t_p"]))
    )


def _from_flat(y: jax.Array, g, spatial) -> jax.Array:
    """(N, F, t_rounded) -> (N, F, D, H, W)."""
    n, f = y.shape[:2]
    d, h, w = spatial
    y = y[:, :, : g["t_p"]].reshape(n, f, g["dp"], g["hp"], g["wp"])
    return y[
        :, :, g["pd"] : g["pd"] + d, g["ph"] : g["ph"] + h, g["pw"] : g["pw"] + w
    ]


def _interior_mask(g, spatial) -> jax.Array:
    """(1, t_rounded) 1.0 at interior (non-pad) positions."""
    d, h, w = spatial
    p = jnp.arange(g["t_rounded"])
    dd = p // g["sp"]
    rem = p % g["sp"]
    hh = rem // g["wp"]
    ww = rem % g["wp"]
    m = (
        (p < g["t_p"])
        & (dd >= g["pd"]) & (dd < g["pd"] + d)
        & (hh >= g["ph"]) & (hh < g["ph"] + h)
        & (ww >= g["pw"]) & (ww < g["pw"] + w)
    )
    return m.astype(jnp.float32)[None]


# ---------------------------------------------------------------------------
# forward / dgrad kernel: y[p] = sum_o w[o]^T x[p + delta_o]
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, w_ref, m_ref, o_ref, *, deltas, halo_pad, t_tile, f):
    x = x_ref[0]  # (C, B) in VMEM — fetched once, reused for every offset
    acc = jnp.zeros((f, t_tile), jnp.float32)
    for idx, d in enumerate(deltas):
        xs = x[:, halo_pad + d : halo_pad + d + t_tile]
        acc = acc + jax.lax.dot_general(
            w_ref[idx], xs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = (acc * m_ref[:]).astype(o_ref.dtype)


def conv3d_flat(x: jax.Array, w: jax.Array, interpret=None) -> jax.Array:
    """SAME stride-1 NCDHW conv, (kd,kh,kw,C,F) weights, Pallas engine."""
    n, c = x.shape[:2]
    spatial = x.shape[2:]
    kernel = w.shape[:3]
    f = w.shape[-1]
    g = _geometry(spatial, kernel)
    xf = _to_flat(x, g)
    wf = w.reshape(-1, c, f).astype(x.dtype)
    mask = _interior_mask(g, spatial)
    b = g["t_tile"] + 2 * g["halo_pad"]
    grid = (n, g["t_rounded"] // g["t_tile"])
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, deltas=g["deltas"], halo_pad=g["halo_pad"],
            t_tile=g["t_tile"], f=f,
        ),
        out_shape=jax.ShapeDtypeStruct((n, f, g["t_rounded"]), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(c), pl.Element(b)),
                lambda i, j, t=g["t_tile"]: (i, 0, j * t),
            ),
            pl.BlockSpec((len(g["deltas"]), c, f), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, g["t_tile"]), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, f, g["t_tile"]), lambda i, j: (i, 0, j)),
        interpret=(not _on_tpu()) if interpret is None else interpret,
    )(xf, wf, mask)
    return _from_flat(out, g, spatial)


# ---------------------------------------------------------------------------
# wgrad kernel: dw[o,c,f] = sum_{n,p} x[p + delta_o] dy[p]   (dy interior-masked)
# ---------------------------------------------------------------------------


def _wgrad_kernel(x_ref, dy_ref, o_ref, *, deltas, halo_pad, t_tile):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    x = x_ref[0]  # (C, B)
    # no interior mask needed: dy is zero at every pad position by
    # construction (spatial zero-pad + tail pad), so masked and unmasked
    # contractions are identical — dropping the mask operand removes one
    # HBM stream per grid step
    dy = dy_ref[0]  # (F, t)
    for idx, d in enumerate(deltas):
        xs = x[:, halo_pad + d : halo_pad + d + t_tile]
        # (C, t) x (F, t) -> (C, F), contract lanes
        o_ref[idx] += jax.lax.dot_general(
            xs, dy, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )


def conv3d_flat_wgrad(x: jax.Array, dy: jax.Array, kernel: Tuple[int, int, int],
                      interpret=None) -> jax.Array:
    n, c = x.shape[:2]
    f = dy.shape[1]
    spatial = x.shape[2:]
    g = _geometry(spatial, kernel)
    xf = _to_flat(x, g)
    # dy embedded in the same flat space with NO halo needed (offsets hit x)
    dyp = jnp.pad(
        dy,
        ((0, 0), (0, 0), (g["pd"], g["pd"]), (g["ph"], g["ph"]), (g["pw"], g["pw"])),
    ).reshape(n, f, g["t_p"])
    dyf = jnp.pad(dyp, ((0, 0), (0, 0), (0, g["t_rounded"] - g["t_p"])))
    b = g["t_tile"] + 2 * g["halo_pad"]
    grid = (n, g["t_rounded"] // g["t_tile"])
    out = pl.pallas_call(
        functools.partial(
            _wgrad_kernel, deltas=g["deltas"], halo_pad=g["halo_pad"],
            t_tile=g["t_tile"],
        ),
        out_shape=jax.ShapeDtypeStruct((len(g["deltas"]), c, f), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(c), pl.Element(b)),
                lambda i, j, t=g["t_tile"]: (i, 0, j * t),
            ),
            pl.BlockSpec((1, f, g["t_tile"]), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec(
            (len(g["deltas"]), c, f), lambda i, j: (0, 0, 0)
        ),
        interpret=(not _on_tpu()) if interpret is None else interpret,
    )(xf, dyf)
    kd, kh, kw = kernel
    return out.reshape(kd, kh, kw, c, f).astype(x.dtype)


# ---------------------------------------------------------------------------
# v2: manual double-buffered HBM->VMEM DMA + im2col contraction
# ---------------------------------------------------------------------------
#
# v1 (Element-indexed windows) measured 12.6 ms/conv vs XLA direct 7.6 ms at
# the C=F=16 128^2x32 layer: per-offset (C,F) GEMMs leave the MXU at C/128
# utilization, and whole-operand VMEM placement broke inside the full step.
# v2 fixes both: x stays in HBM (memory_space=ANY) with an explicitly
# double-buffered window DMA per grid step, and for small C the 27 shifted
# slices are stacked into one (K*C, t_tile) im2col matrix so the MXU
# contracts over K*C (432 for C=16) instead of C.

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _fwd_v2_kernel(x_hbm, w_ref, m_ref, o_ref, xbuf, xcol, sem, *,
                   deltas, halo_pad, t_tile, f, c, im2col):
    n_i = pl.program_id(0)
    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    b = t_tile + 2 * halo_pad

    def window_dma(slot, nn, jj):
        return pltpu.make_async_copy(
            x_hbm.at[nn, :, pl.dslice(jj * t_tile, b)],
            xbuf.at[slot],
            sem.at[slot],
        )

    step = n_i * n_tiles + j

    @pl.when(step == 0)
    def _warmup():
        window_dma(0, n_i, j).start()

    # prefetch the next window while computing this one
    nxt_n = jnp.where(j + 1 < n_tiles, n_i, n_i + 1)
    nxt_j = jnp.where(j + 1 < n_tiles, j + 1, 0)

    @pl.when(step + 1 < pl.num_programs(0) * n_tiles)
    def _prefetch():
        window_dma((step + 1) % 2, nxt_n, nxt_j).start()

    window_dma(step % 2, n_i, j).wait()
    x = xbuf[step % 2]  # (C, B)

    if im2col:
        for idx, d in enumerate(deltas):
            xcol[idx * c:(idx + 1) * c, :] = x[:, halo_pad + d: halo_pad + d + t_tile]
        acc = jax.lax.dot_general(
            w_ref[:], xcol[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (KC,F) x (KC,t) -> (F,t)
    else:
        acc = jnp.zeros((f, t_tile), jnp.float32)
        for idx, d in enumerate(deltas):
            xs = x[:, halo_pad + d: halo_pad + d + t_tile]
            acc = acc + jax.lax.dot_general(
                w_ref[idx * c:(idx + 1) * c], xs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = (acc * m_ref[:]).astype(o_ref.dtype)


def conv3d_flat_v2(x: jax.Array, w: jax.Array, interpret=None) -> jax.Array:
    n, c = x.shape[:2]
    spatial = x.shape[2:]
    kernel = w.shape[:3]
    f = w.shape[-1]
    g = _geometry(spatial, kernel)
    k = len(g["deltas"])
    im2col = c <= 32
    xf = _to_flat(x, g)
    wf = w.reshape(k * c, f).astype(x.dtype)
    mask = _interior_mask(g, spatial)
    b = g["t_tile"] + 2 * g["halo_pad"]
    grid = (n, g["t_rounded"] // g["t_tile"])
    interp = (not _on_tpu()) if interpret is None else interpret
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    if interp or pltpu is None or c % sublane != 0:
        # CPU tests, and channel counts the DMA engine can't window
        # ("slice along dim 1 must be aligned to tiling")
        return conv3d_flat(x, w, interpret=interpret)
    scratch = [
        pltpu.VMEM((2, c, b), x.dtype),
        pltpu.VMEM((k * c, g["t_tile"]) if im2col else (1, 128), x.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    out = pl.pallas_call(
        functools.partial(
            _fwd_v2_kernel, deltas=g["deltas"], halo_pad=g["halo_pad"],
            t_tile=g["t_tile"], f=f, c=c, im2col=im2col,
        ),
        out_shape=jax.ShapeDtypeStruct((n, f, g["t_rounded"]), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k * c, f), lambda i, j: (0, 0)),
            pl.BlockSpec((1, g["t_tile"]), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, f, g["t_tile"]), lambda i, j: (i, 0, j)),
        scratch_shapes=scratch,
        interpret=False,
    )(xf, wf, mask)
    return _from_flat(out, g, spatial)
