"""Pallas implicit-GEMM conv3d engine — numeric oracles (interpret mode on
CPU; the same kernels run compiled on TPU).  See ops/pallas_conv.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import saragan_tpu.ops.core as core
from saragan_tpu.ops.core import _conv_direct, _wgrad_einsum
from saragan_tpu.ops.pallas_conv import conv3d_flat, conv3d_flat_wgrad


def _xw(kernel=(3, 3, 3), c=3, f=5, shape=(2, 4, 6, 6), seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(shape[0], c, *shape[1:])), jnp.float32)
    w = jnp.asarray(rng.normal(size=(*kernel, c, f)) * 0.3, jnp.float32)
    return x, w


@pytest.mark.parametrize("kernel", [(3, 3, 3), (1, 3, 3), (3, 1, 1)])
def test_forward_matches_direct(kernel):
    x, w = _xw(kernel)
    np.testing.assert_allclose(
        np.asarray(conv3d_flat(x, w)), np.asarray(_conv_direct(x, w)), rtol=2e-5, atol=2e-5
    )


def test_forward_nonuniform_spatial():
    x, w = _xw(shape=(1, 8, 4, 10), c=2, f=3)
    np.testing.assert_allclose(
        np.asarray(conv3d_flat(x, w)), np.asarray(_conv_direct(x, w)), rtol=2e-5, atol=2e-5
    )


def test_wgrad_matches_einsum():
    x, w = _xw()
    dy = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5, 4, 6, 6)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv3d_flat_wgrad(x, dy, (3, 3, 3))),
        np.asarray(_wgrad_einsum(x, dy, (3, 3, 3))),
        rtol=2e-4, atol=2e-5,
    )


def test_second_order_through_pallas_engine(monkeypatch):
    """WGAN-GP pattern through the custom-VJP algebra with the Pallas engine."""
    monkeypatch.setattr(core, "CONV3D_ALGORITHM", "pallas")
    x, w = _xw(c=2, f=3, seed=2)

    def gp(conv):
        def disc(xx, ww):
            return jnp.sum(jnp.tanh(conv(xx, ww)))

        def inner(ww):
            g = jax.grad(disc, argnums=0)(x, ww)
            return jnp.sum(jnp.square(g))

        return jax.grad(inner)(w)

    np.testing.assert_allclose(
        np.asarray(gp(core._conv3d_C)), np.asarray(gp(_conv_direct)), rtol=5e-4, atol=5e-4
    )


def test_bf16_inputs():
    x, w = _xw()
    y = conv3d_flat(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(_conv_direct(x, w)), rtol=0.06, atol=0.06
    )


def test_conv3d_flat_v2_matches_direct():
    """v2 (manual double-buffered DMA + im2col) oracle: must equal the direct
    conv. Selector-reachable via SARAGAN_CONV3D=pallas2 (fwd/dgrad engine)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 2, 2, 4, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 2)).astype(np.float32))
    from saragan_tpu.ops.pallas_conv import conv3d_flat_v2

    y = conv3d_flat_v2(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_conv_direct(x, w)),
                               atol=2e-5, rtol=1e-4)
