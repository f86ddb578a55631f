"""Unit tests for the functional op library.

Strategy (SURVEY.md §4): every op gets a numpy/analytic oracle, and the ops
whose reference versions carry hand-written custom gradients (leaky_relu,
upscale, downscale — reference ops.py:167-182,276-305) get first- AND
second-order gradient checks, since WGAN-GP differentiates through the
discriminator twice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saragan_tpu.core import Scope, param_count
from saragan_tpu import ops


def make_scope(params=None, init=True, seed=0):
    return Scope(params if params is not None else {}, init=init, rng=jax.random.PRNGKey(seed))


# ---------------------------------------------------------------------------
# gains / weights
# ---------------------------------------------------------------------------


def test_calculate_gain():
    assert ops.calculate_gain("linear") == 1.0
    assert ops.calculate_gain("conv3d") == 1.0
    assert np.isclose(ops.calculate_gain("relu"), np.sqrt(2.0))
    assert np.isclose(ops.calculate_gain("tanh"), 5.0 / 3)
    assert np.isclose(ops.calculate_gain("leaky_relu", 0.2), np.sqrt(2.0 / 1.04))
    with pytest.raises(ValueError):
        ops.calculate_gain("leaky_relu", "bad")


def test_get_weight_equalized_lr():
    scope = make_scope()
    shape = (3, 3, 3, 16, 32)
    w = ops.get_weight(scope, shape, "leaky_relu", param=0.2)
    raw = scope.params["weight"]
    fan_in = np.prod(shape[:-1])
    he_std = np.sqrt(2.0 / 1.04) / np.sqrt(fan_in)
    # runtime value = raw * he_std (lrmul=1)
    np.testing.assert_allclose(np.asarray(w), np.asarray(raw) * he_std, rtol=1e-6)
    # raw variable is ~N(0, 1)
    assert 0.9 < float(jnp.std(raw)) < 1.1


def test_get_weight_lrmul():
    scope = make_scope()
    w = ops.get_weight(scope, (64, 64), "linear", lrmul=0.01)
    raw = scope.params["weight"]
    # init std = 1/lrmul = 100; runtime coef = he_std * lrmul
    assert 90 < float(jnp.std(raw)) < 110
    he_std = 1.0 / np.sqrt(64)
    np.testing.assert_allclose(np.asarray(w), np.asarray(raw) * he_std * 0.01, rtol=1e-6)


def test_init_is_order_independent():
    s1 = make_scope()
    a1 = s1.sub("a").get("weight", (4, 4), lambda k, s, d: jax.random.normal(k, s, d))
    b1 = s1.sub("b").get("weight", (4, 4), lambda k, s, d: jax.random.normal(k, s, d))
    s2 = make_scope()
    b2 = s2.sub("b").get("weight", (4, 4), lambda k, s, d: jax.random.normal(k, s, d))
    a2 = s2.sub("a").get("weight", (4, 4), lambda k, s, d: jax.random.normal(k, s, d))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    assert not np.array_equal(np.asarray(a1), np.asarray(b1))


# ---------------------------------------------------------------------------
# dense / conv / bias
# ---------------------------------------------------------------------------


def test_dense_matches_numpy(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 8)).astype(np.float32))
    scope = make_scope()
    y = ops.dense(scope, x, 16, "linear")
    w = np.asarray(scope.params["weight"]) * (1.0 / np.sqrt(8))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ w, rtol=1e-5)


def test_dense_flattens(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 4, 2, 2, 2)).astype(np.float32))
    scope = make_scope()
    y = ops.dense(scope, x, 3, "linear")
    assert y.shape == (2, 3)
    assert scope.params["weight"].shape == (32, 3)


def test_conv3d_shape_and_oracle(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 3, 4, 4, 4)).astype(np.float32))
    scope = make_scope()
    y = ops.conv3d(scope, x, 5, (3, 3, 3), "linear")
    assert y.shape == (2, 5, 4, 4, 4)
    # oracle: 1x1x1 conv == channel matmul
    scope2 = make_scope(seed=1)
    y2 = ops.conv3d(scope2, x, 5, (1, 1, 1), "linear")
    w = np.asarray(scope2.params["weight"]) * (1.0 / np.sqrt(3))  # (1,1,1,3,5)
    expected = np.einsum("ncdhw,cf->nfdhw", np.asarray(x), w[0, 0, 0])
    np.testing.assert_allclose(np.asarray(y2), expected, rtol=1e-4, atol=1e-5)


def test_conv2d_shape(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 3, 8, 8)).astype(np.float32))
    scope = make_scope()
    y = ops.conv2d(scope, x, 4, (3, 3), "linear")
    assert y.shape == (2, 4, 8, 8)


def test_apply_bias_shapes(np_rng):
    x2 = jnp.asarray(np_rng.normal(size=(2, 5)).astype(np.float32))
    x5 = jnp.asarray(np_rng.normal(size=(2, 5, 2, 2, 2)).astype(np.float32))
    s = make_scope()
    y2 = ops.apply_bias(s.sub("a"), x2)
    y5 = ops.apply_bias(s.sub("b"), x5)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(x2))  # zero init
    np.testing.assert_array_equal(np.asarray(y5), np.asarray(x5))
    assert s.params["a/bias"].shape == (5,)


# ---------------------------------------------------------------------------
# activations: value + 1st + 2nd order grads
# ---------------------------------------------------------------------------


def test_leaky_relu_value(np_rng):
    x = np_rng.normal(size=(64,)).astype(np.float32)
    y = np.asarray(ops.leaky_relu(jnp.asarray(x), 0.2))
    np.testing.assert_allclose(y, np.maximum(x, 0.2 * x), rtol=1e-6)


def test_leaky_relu_grads_match_reference():
    # Reference: dx = where(y>=0, dy, dy*alpha); ddx -> where(y>=0, ddx, ddx*alpha)
    x = jnp.asarray([-2.0, -0.5, 0.5, 2.0])
    f = lambda x: ops.leaky_relu(x, 0.2)
    dy = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    _, vjp = jax.vjp(f, x)
    (dx,) = vjp(dy)
    np.testing.assert_allclose(np.asarray(dx), [0.2, 0.2, 1.0, 1.0], rtol=1e-6)
    # second order: d/d(dy) of vjp is the same mask again
    _, vjp2 = jax.vjp(lambda dy: vjp(dy)[0], dy)
    (ddx,) = vjp2(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(ddx), [0.2, 0.2, 1.0, 1.0], rtol=1e-6)


# ---------------------------------------------------------------------------
# up/down scaling: values + adjoint pair through 2nd order
# ---------------------------------------------------------------------------


def test_upscale_value(np_rng):
    x = np_rng.normal(size=(1, 2, 2, 2, 2)).astype(np.float32)
    y = np.asarray(ops.upscale3d(jnp.asarray(x)))
    assert y.shape == (1, 2, 4, 4, 4)
    expected = x.repeat(2, 2).repeat(2, 3).repeat(2, 4)
    np.testing.assert_array_equal(y, expected)


def test_downscale_value(np_rng):
    x = np_rng.normal(size=(1, 2, 4, 4, 4)).astype(np.float32)
    y = np.asarray(ops.downscale3d(jnp.asarray(x)))
    assert y.shape == (1, 2, 2, 2, 2)
    expected = x.reshape(1, 2, 2, 2, 2, 2, 2, 2).mean(axis=(3, 5, 7))
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_upscale_grad_is_sumpool(np_rng):
    """Reference ops.py:284: grad(upscale)(dy) = avg_pool(dy, gain=factor**3)."""
    x = jnp.asarray(np_rng.normal(size=(1, 1, 2, 2, 2)).astype(np.float32))
    dy = jnp.asarray(np_rng.normal(size=(1, 1, 4, 4, 4)).astype(np.float32))
    _, vjp = jax.vjp(ops.upscale3d, x)
    (dx,) = vjp(dy)
    expected = np.asarray(ops.avg_pool(dy, 2, gain=8.0))
    np.testing.assert_allclose(np.asarray(dx), expected, rtol=1e-5)
    # 2nd order (reference ops.py:285: ddx -> avg_unpool3d(ddx))
    _, vjp2 = jax.vjp(lambda dy: vjp(dy)[0], dy)
    ddx_in = jnp.asarray(np_rng.normal(size=x.shape).astype(np.float32))
    (ddy,) = vjp2(ddx_in)
    np.testing.assert_allclose(np.asarray(ddy), np.asarray(ops.avg_unpool(ddx_in, 2)), rtol=1e-5)


def test_downscale_grad_is_scaled_unpool(np_rng):
    """Reference ops.py:300: grad(downscale)(dy) = avg_unpool(dy, gain=1/factor**3)."""
    x = jnp.asarray(np_rng.normal(size=(1, 1, 4, 4, 4)).astype(np.float32))
    dy = jnp.asarray(np_rng.normal(size=(1, 1, 2, 2, 2)).astype(np.float32))
    _, vjp = jax.vjp(ops.downscale3d, x)
    (dx,) = vjp(dy)
    expected = np.asarray(ops.avg_unpool(dy, 2, gain=1 / 8.0))
    np.testing.assert_allclose(np.asarray(dx), expected, rtol=1e-5)


def test_up_down_2d(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 3, 4, 4)).astype(np.float32))
    assert ops.upscale2d(x).shape == (2, 3, 8, 8)
    assert ops.downscale2d(x).shape == (2, 3, 2, 2)


# ---------------------------------------------------------------------------
# normalization layers
# ---------------------------------------------------------------------------


def test_pixel_norm_oracle(np_rng):
    x = np_rng.normal(size=(2, 8, 4, 4, 4)).astype(np.float32)
    y = np.asarray(ops.pixel_norm(jnp.asarray(x)))
    expected = x / np.sqrt(np.mean(x**2, axis=1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(y, expected, rtol=1e-5)


def test_instance_norm_oracle(np_rng):
    x = np_rng.normal(size=(2, 3, 4, 4, 4)).astype(np.float32)
    y = np.asarray(ops.instance_norm(jnp.asarray(x)))
    m = x.mean(axis=(2, 3, 4), keepdims=True)
    c = x - m
    expected = c / np.sqrt(np.mean(c**2, axis=(2, 3, 4), keepdims=True) + 1e-8)
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_minibatch_stddev_oracle(np_rng):
    x = np_rng.normal(size=(4, 3, 2, 2, 2)).astype(np.float32)
    y = np.asarray(ops.minibatch_stddev_layer(jnp.asarray(x), group_size=4))
    assert y.shape == (4, 4, 2, 2, 2)
    np.testing.assert_array_equal(y[:, :3], x)
    g = x - x.mean(axis=0, keepdims=True)
    stat = np.sqrt((g**2).mean(axis=0) + 1e-8).mean()
    np.testing.assert_allclose(y[:, 3], np.full((4, 2, 2, 2), stat), rtol=1e-5)


def test_minibatch_stddev_group_clamp(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 3, 2, 2, 2)).astype(np.float32))
    y = ops.minibatch_stddev_layer(x, group_size=4)  # clamps to batch size 2
    assert y.shape == (2, 4, 2, 2, 2)


# ---------------------------------------------------------------------------
# style / noise
# ---------------------------------------------------------------------------


def test_apply_noise(np_rng, rng):
    x = jnp.asarray(np_rng.normal(size=(2, 3, 4, 4, 4)).astype(np.float32))
    s = make_scope()
    y = ops.apply_noise(s, x, rng)
    # zero-initialized strength -> identity
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    assert s.params["noise_strength"].shape == ()


def test_style_mod_shapes(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 8, 4, 4, 4)).astype(np.float32))
    w = jnp.asarray(np_rng.normal(size=(2, 16)).astype(np.float32))
    s = make_scope()
    y = ops.style_mod(s, x, w, "leaky_relu", param=0.2)
    assert y.shape == x.shape
    assert s.params["style_mod/weight"].shape == (16, 16)


# ---------------------------------------------------------------------------
# schedules / sizing
# ---------------------------------------------------------------------------


def test_alpha_update():
    alpha = jnp.asarray(1.0)
    # mixing_nimg=0 -> assign 0 (reference ops.py:17-18)
    assert float(ops.alpha_update(alpha, 0, 1.0, 4, 2)) == 0.0
    # 80 images, batch 4 x 2 workers -> 10 steps, step = 0.1
    a = ops.alpha_update(alpha, 80, 1.0, 4, 2)
    np.testing.assert_allclose(float(a), 0.9, rtol=1e-6)
    # floors at 0
    assert float(ops.alpha_update(jnp.asarray(0.05), 80, 1.0, 4, 2)) == 0.0


def test_get_kernel():
    assert ops.get_kernel([4, 4, 2], [5, 3, 3]) == [3, 3, 1]
    assert ops.get_kernel([16, 16, 16], [3, 3, 3]) == [3, 3, 3]
    assert ops.get_kernel([5, 4, 3], [7, 7, 3]) == [5, 3, 3]


def test_num_filters_3d():
    # base_shape (c, d, h, w) = (1, 4, 4, 1): phase 1 -> 16 voxels, log2=4 -> idx 0
    assert ops.num_filters(1, 6, (1, 4, 4, 1), size="xs") == 256
    # phase 2 -> (8,8,2)=128 voxels, log2=7 -> idx 1
    assert ops.num_filters(2, 6, (1, 4, 4, 1), size="xs") == 256
    # phase 3 -> (16,16,4)=1024, log2=10 -> idx 2
    assert ops.num_filters(3, 6, (1, 4, 4, 1), size="xs") == 64
    with pytest.raises(ValueError):
        ops.num_filters(1, 6, (1, 4, 4, 1), size="nope")


def test_num_filters_2d():
    assert ops.num_filters_2d(1, 9, size="xs") == 128
    assert ops.num_filters_2d(9, 9, size="xs") == 4
    assert ops.num_filters_2d(1, 13, size="m") == 512


def test_param_count():
    s = make_scope()
    ops.dense(s.sub("generator/a"), jnp.zeros((1, 4)), 8, "linear")
    ops.dense(s.sub("discriminator/b"), jnp.zeros((1, 4)), 8, "linear")
    assert param_count(s.params) == 64
    assert param_count(s.params, "generator") == 32


# ---------------------------------------------------------------------------
# custom-VJP conv3d (gemm_custom): hand-written dgrad/wgrad, any-order AD
# (VERDICT r1 item 4 groundwork; algebra in ops/core.py _conv3d_C/_conv3d_W)
# ---------------------------------------------------------------------------


class TestConvCustomVjp:
    def _xw(self, kernel=(3, 3, 3), c=3, f=5, seed=0):
        import numpy as _np

        rng = _np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(2, c, 4, 6, 6)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(*kernel, c, f)) * 0.3, jnp.float32)
        return x, w

    @pytest.mark.parametrize("kernel", [(3, 3, 3), (1, 3, 3), (1, 1, 1)])
    def test_forward_matches_direct(self, kernel):
        from saragan_tpu.ops.core import _conv3d_C, _conv_direct

        x, w = self._xw(kernel)
        np.testing.assert_allclose(
            np.asarray(_conv3d_C(x, w)), np.asarray(_conv_direct(x, w)), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("wgrad", ["xla", "einsum"])
    def test_first_order_grads_match_direct(self, wgrad, monkeypatch):
        from saragan_tpu.ops.core import _conv3d_C, _conv_direct

        monkeypatch.setenv("SARAGAN_CONV3D_WGRAD", wgrad)
        x, w = self._xw()

        def loss(conv):
            return lambda x, w: jnp.sum(jnp.tanh(conv(x, w)))

        gx1, gw1 = jax.grad(loss(_conv3d_C), argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(loss(_conv_direct), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=2e-4, atol=2e-5)

    def test_second_order_gp_style_matches_direct(self):
        """The WGAN-GP pattern: grad wrt params of ||grad wrt input||^2."""
        from saragan_tpu.ops.core import _conv3d_C, _conv_direct

        x, w = self._xw(c=2, f=3, seed=1)

        def gp(conv):
            def disc(xx, ww):
                y = conv(xx, ww)
                return jnp.sum(jnp.tanh(y))

            def inner(ww):
                g = jax.grad(disc, argnums=0)(x, ww)
                return jnp.sum(jnp.square(g))

            return jax.grad(inner)(w)

        np.testing.assert_allclose(
            np.asarray(gp(_conv3d_C)), np.asarray(gp(_conv_direct)), rtol=5e-4, atol=5e-5
        )

    def test_third_order_closes(self):
        """The algebra closes on itself: differentiate once more than the GP."""
        from saragan_tpu.ops.core import _conv3d_C, _conv_direct

        x, w = self._xw(c=2, f=2, seed=2)
        v = jnp.ones_like(w)

        def f3(conv):
            def disc(xx, ww):
                return jnp.sum(jnp.tanh(conv(xx, ww)))

            def gp_loss(ww):
                g = jax.grad(disc, argnums=0)(x, ww)
                return jnp.sum(jnp.square(g))

            def gp_grad_norm(ww):
                return jnp.sum(jax.grad(gp_loss)(ww) * v)

            return jax.grad(gp_grad_norm)(w)

        np.testing.assert_allclose(
            np.asarray(f3(_conv3d_C)), np.asarray(f3(_conv_direct)), rtol=1e-3, atol=1e-4
        )

    def test_conv_apply_dispatch(self, monkeypatch):
        import saragan_tpu.ops.core as core

        x, w = self._xw()
        monkeypatch.setattr(core, "CONV3D_ALGORITHM", "gemm_custom")
        y = core.conv_apply(x, w)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(core._conv_direct(x, w)), rtol=2e-5, atol=2e-5
        )


# ---------------------------------------------------------------------------
# phase-8 recipe paths (BASELINE.md "Phase-8 on one chip — RUNS"): the
# layout-safe formulations must be numerically faithful to the defaults
# ---------------------------------------------------------------------------


def test_wgrad_mulsum_1x1_matches_einsum_oracle(np_rng):
    from saragan_tpu.ops import core as c

    x = jnp.asarray(np_rng.normal(size=(2, 3, 4, 6, 5)).astype(np.float32))
    dy = jnp.asarray(np_rng.normal(size=(2, 7, 4, 6, 5)).astype(np.float32))
    dw = c._wgrad_mulsum_1x1(x, dy)
    ref = jnp.einsum("ncdhw,nfdhw->cf", x, dy).reshape(1, 1, 1, 3, 7)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_conv1x1_mulsum_and_broadcast_match_direct(np_rng):
    """The skinny-channel 1x1 branches (c==1 broadcast-mul; c,f<=32 mul-sum)
    of _conv3d_shifted_gemm must match the direct conv."""
    from saragan_tpu.ops import core as c

    for cin in (1, 5):
        x = jnp.asarray(np_rng.normal(size=(2, cin, 4, 6, 5)).astype(np.float32))
        w = jnp.asarray(np_rng.normal(size=(1, 1, 1, cin, 7)).astype(np.float32))
        got = c._conv3d_shifted_gemm(x, w)
        ref = c._conv_direct(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_avg_pool_window_matches_reshape(monkeypatch, np_rng):
    from saragan_tpu.ops import core as c

    x = jnp.asarray(np_rng.normal(size=(2, 3, 4, 6, 8)).astype(np.float32))
    base = c.avg_pool(x, 2)
    monkeypatch.setattr(c, "POOL_WINDOW", True)
    win = c.avg_pool(x, 2)
    np.testing.assert_allclose(np.asarray(win), np.asarray(base), rtol=1e-6, atol=1e-6)
    # second-order differentiability (the GP path reaches downscale)
    f = lambda y: jnp.sum(jnp.tanh(c.avg_pool(y, 2)))
    g2 = jax.grad(lambda y: jnp.sum(jax.grad(f)(y) ** 2))(x)
    monkeypatch.setattr(c, "POOL_WINDOW", False)
    g2_ref = jax.grad(lambda y: jnp.sum(jax.grad(f)(y) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g2_ref), rtol=1e-5, atol=1e-6)


def test_pixel_norm_compute_dtype_stats(monkeypatch, np_rng):
    from saragan_tpu.ops import core as c

    x = jnp.asarray(np_rng.normal(size=(2, 16, 4, 4, 4)).astype(np.float32))
    base = c.pixel_norm(x)
    monkeypatch.setattr(c, "STATS_ACCUM_F32", False)
    fast = c.pixel_norm(x)
    # f32 inputs: identical math either way; bf16 inputs: close
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base), rtol=1e-6)
    xb = x.astype(jnp.bfloat16)
    fast_b = c.pixel_norm(xb)
    monkeypatch.setattr(c, "STATS_ACCUM_F32", True)
    base_b = c.pixel_norm(xb)
    np.testing.assert_allclose(
        np.asarray(fast_b, np.float32), np.asarray(base_b, np.float32), rtol=3e-2, atol=3e-2
    )
