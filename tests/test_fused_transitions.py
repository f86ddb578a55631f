"""Fused upscale+conv transition: exact equality with the unfused path
through 1st-order gradients, and pgan parity under cfg.fused_transitions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saragan_tpu.config import Config
from saragan_tpu.models import get_architecture
from saragan_tpu.ops.core import _conv_direct, avg_unpool, upscale_conv


@pytest.mark.parametrize(
    "shape,kshape",
    [
        ((2, 3, 4, 5, 6), (3, 3, 3)),
        ((1, 2, 2, 2, 2), (3, 3, 3)),
        ((2, 3, 6, 5), (3, 3)),
        ((1, 2, 4, 4, 4), (1, 3, 3)),
        ((1, 2, 4, 4, 4), (1, 1, 1)),
        ((2, 2, 3, 4, 4), (5, 5, 5)),
    ],
)
def test_upscale_conv_matches_oracle(np_rng, shape, kshape):
    x = jnp.asarray(np_rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(np_rng.normal(size=(*kshape, shape[1], 4)).astype(np.float32)) * 0.1
    oracle = _conv_direct(avg_unpool(x, 2), w)
    got = upscale_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), rtol=1e-4, atol=1e-5)


def test_upscale_conv_gradients(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 3, 4, 4, 4)).astype(np.float32))
    w = jnp.asarray(np_rng.normal(size=(3, 3, 3, 3, 4)).astype(np.float32)) * 0.1
    f1 = lambda x, w: jnp.sum(jnp.sin(upscale_conv(x, w)))
    f2 = lambda x, w: jnp.sum(jnp.sin(_conv_direct(avg_unpool(x, 2), w)))
    for arg in (0, 1):
        g1 = jax.grad(f1, arg)(x, w)
        g2 = jax.grad(f2, arg)(x, w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4)


def test_pgan_fused_transitions_parity(rng):
    base = dict(
        architecture="pgan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 16, 16, 16)",
        latent_dim=16,
        kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    )
    cfg = Config(**base, fused_transitions=False).finalize()
    cfg_f = Config(**base, fused_transitions=True).finalize()
    arch = get_architecture("pgan")
    params = arch.init(rng, phase=2, cfg=cfg)
    params_f = arch.init(rng, phase=2, cfg=cfg_f)
    assert set(params) == set(params_f)  # identical parameter tree
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    a = arch.generator(params, z, 0.5, phase=2, cfg=cfg)
    b = arch.generator(params, z, 0.5, phase=2, cfg=cfg_f)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_pgan2_fused_transitions_parity(rng):
    cfg_base = dict(
        architecture="pgan2",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 32, 32, 32)",
        latent_dim=16,
        network_size="xxs",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    )
    cfg = Config(**cfg_base, fused_transitions=False).finalize()
    cfg_f = Config(**cfg_base, fused_transitions=True).finalize()
    arch = get_architecture("pgan2")
    params = arch.init(rng, phase=2, cfg=cfg)
    params_f = arch.init(rng, phase=2, cfg=cfg_f)
    assert set(params) == set(params_f)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    a = arch.generator(params, z, 0.5, phase=2, cfg=cfg)
    b = arch.generator(params, z, 0.5, phase=2, cfg=cfg_f)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_stylegan_fused_transitions_parity(rng):
    cfg_base = dict(
        architecture="stylegan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 32, 32, 32)",
        latent_dim=16,
        network_size="xxs",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    )
    cfg = Config(**cfg_base, fused_transitions=False).finalize()
    cfg_f = Config(**cfg_base, fused_transitions=True).finalize()
    arch = get_architecture("stylegan")
    params = arch.init(rng, phase=2, cfg=cfg)
    params_f = arch.init(rng, phase=2, cfg=cfg_f)
    assert set(params) == set(params_f)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    k = jax.random.PRNGKey(2)
    a = arch.generator(params, z, 0.5, phase=2, cfg=cfg, rng=k)
    b = arch.generator(params, z, 0.5, phase=2, cfg=cfg_f, rng=k)
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-3, atol=1e-4
    )


def test_stylegan2_fused_transitions_parity(rng):
    cfg_base = dict(
        architecture="stylegan2",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 32, 32, 32)",
        starting_phase=2,
        ending_phase=2,
        latent_dim=16,
        network_size="xxs",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    )
    cfg = Config(**cfg_base, fused_transitions=False).finalize()
    cfg_f = Config(**cfg_base, fused_transitions=True).finalize()
    arch = get_architecture("stylegan2")
    params = arch.init(rng, phase=2, cfg=cfg)
    params_f = arch.init(rng, phase=2, cfg=cfg_f)
    assert set(params) == set(params_f)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    a = arch.generator(params, z, 0.0, phase=2, cfg=cfg, train=False)
    b = arch.generator(params, z, 0.0, phase=2, cfg=cfg_f, train=False)
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-3, atol=1e-4
    )


def test_surfgan_fused_transitions_parity(rng):
    cfg_base = dict(
        architecture="surfgan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 32, 32, 32)",
        latent_dim=16,
        network_size="xxs",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    )
    cfg = Config(**cfg_base, fused_transitions=False).finalize()
    cfg_f = Config(**cfg_base, fused_transitions=True).finalize()
    arch = get_architecture("surfgan")
    params = arch.init(rng, phase=2, cfg=cfg)
    params_f = arch.init(rng, phase=2, cfg=cfg_f)
    assert set(params) == set(params_f)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    a = arch.generator(params, z, 0.0, phase=2, cfg=cfg, train=False)
    b = arch.generator(params, z, 0.0, phase=2, cfg=cfg_f, train=False)
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize(
    "shape,kshape",
    [
        ((2, 3, 4, 6, 8), (3, 3, 3)),
        ((1, 2, 2, 2, 2), (3, 3, 3)),
        ((2, 3, 6, 4), (3, 3)),
        ((1, 2, 4, 4, 4), (1, 3, 3)),
        ((1, 2, 4, 4, 4), (1, 1, 1)),
        ((2, 2, 4, 4, 4), (5, 5, 5)),
    ],
)
def test_conv_downscale_matches_oracle(np_rng, shape, kshape):
    """conv_downscale == downscale(conv(x, w)) exactly (the mirror identity
    of upscale_conv: stride-2 conv with the box-averaged (k+1)^d kernel)."""
    from saragan_tpu.ops.core import conv_downscale, downscale

    x = jnp.asarray(np_rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(np_rng.normal(size=(*kshape, shape[1], 4)).astype(np.float32)) * 0.1
    oracle = downscale(_conv_direct(x, w), 2)
    got = conv_downscale(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), rtol=1e-4, atol=1e-5)


def test_conv_downscale_gradients_and_second_order(np_rng):
    """1st-order grads match the unfused form, and the WGAN-GP-shaped
    grad-of-grad (d/dw of ||d/dx||) agrees — the op is safe inside D."""
    from saragan_tpu.ops.core import conv_downscale, downscale

    x = jnp.asarray(np_rng.normal(size=(2, 3, 4, 4, 4)).astype(np.float32))
    w = jnp.asarray(np_rng.normal(size=(3, 3, 3, 3, 4)).astype(np.float32)) * 0.1
    f1 = lambda x, w: jnp.sum(jnp.sin(conv_downscale(x, w)))
    f2 = lambda x, w: jnp.sum(jnp.sin(downscale(_conv_direct(x, w), 2)))
    for arg in (0, 1):
        g1 = jax.grad(f1, arg)(x, w)
        g2 = jax.grad(f2, arg)(x, w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4)

    def gp_like(f):
        def inner(w):
            slopes = jax.grad(lambda xx: jnp.sum(f(xx, w)))(x)
            return jnp.sum(jnp.sqrt(jnp.sum(jnp.square(slopes)) + 1e-8))

        return jax.grad(inner)(w)

    np.testing.assert_allclose(
        np.asarray(gp_like(f1)), np.asarray(gp_like(f2)), rtol=1e-3, atol=1e-4
    )
