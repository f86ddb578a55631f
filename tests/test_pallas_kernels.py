"""Pallas fused-kernel tests (interpreter mode on the CPU mesh; the jnp
reference implementations are the oracles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saragan_tpu.ops.pallas_kernels import (
    _reference_forward,
    bias_act_pixelnorm,
    fused_bias_act_pixelnorm,
    minibatch_stddev_stat,
)


@pytest.fixture
def xb(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 16, 4, 8, 128)).astype(np.float32))
    b = jnp.asarray(np_rng.normal(size=(16,)).astype(np.float32))
    return x, b


def test_fused_matches_reference(xb):
    x, b = xb
    for pn in (True, False):
        got = fused_bias_act_pixelnorm(x, b, 0.2, pn)
        want = _reference_forward(x, b, 0.2, pn)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_fused_2d(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 8, 16, 128)).astype(np.float32))
    b = jnp.asarray(np_rng.normal(size=(8,)).astype(np.float32))
    got = fused_bias_act_pixelnorm(x, b, 0.2, True)
    want = _reference_forward(x, b, 0.2, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_fused_first_order_grads(xb):
    x, b = xb

    def f_fused(x, b):
        return jnp.sum(jnp.sin(fused_bias_act_pixelnorm(x, b, 0.2, True)))

    def f_ref(x, b):
        return jnp.sum(jnp.sin(_reference_forward(x, b, 0.2, True)))

    gx, gb = jax.grad(f_fused, argnums=(0, 1))(x, b)
    rx, rb = jax.grad(f_ref, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4, atol=1e-5)


def test_fused_second_order_grads(xb):
    """GP-style grad-of-grad through the custom VJP."""
    x, b = xb

    def gp(x, b):
        g = jax.grad(lambda xi: jnp.sum(fused_bias_act_pixelnorm(xi, b, 0.2, False)))(x)
        return jnp.sum(jnp.square(g))

    def gp_ref(x, b):
        g = jax.grad(lambda xi: jnp.sum(_reference_forward(xi, b, 0.2, False)))(x)
        return jnp.sum(jnp.square(g))

    got = jax.grad(gp, argnums=1)(x, b)
    want = jax.grad(gp_ref, argnums=1)(x, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_dispatcher_paths(xb):
    x, b = xb
    fused = bias_act_pixelnorm(x, b, 0.2, True, force=True)
    unfused = bias_act_pixelnorm(x, b, 0.2, True, force=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused), rtol=1e-5, atol=1e-6)


def test_fused_bf16(xb):
    x, b = xb
    got = fused_bias_act_pixelnorm(x.astype(jnp.bfloat16), b, 0.2, True)
    assert got.dtype == jnp.bfloat16
    # the kernel does all math in f32 and rounds once at the end (more
    # accurate); the unfused oracle rounds after the lrelu — compare both
    # against the full-f32 result
    want = _reference_forward(x, b, 0.2, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=5e-2, atol=2e-2
    )


def test_minibatch_stddev_stat(np_rng):
    from saragan_tpu import ops

    x = jnp.asarray(np_rng.normal(size=(8, 3, 2, 4, 4)).astype(np.float32))
    stat = minibatch_stddev_stat(x, group_size=4)  # (2, 1)
    ref = ops.minibatch_stddev_layer(x, group_size=4)
    # the reference tiles the per-group scalar into the extra channel;
    # group m holds interleaved samples {m, m+2, m+4, m+6}
    np.testing.assert_allclose(float(stat[0, 0]), float(ref[0, 3, 0, 0, 0]), rtol=1e-5)
    np.testing.assert_allclose(float(stat[1, 0]), float(ref[1, 3, 0, 0, 0]), rtol=1e-5)
