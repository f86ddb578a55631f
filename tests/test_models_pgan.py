"""pgan model tests: shapes, parameter names/counts, alpha blending,
phase growth / partial restore, 2D and 3D, bf16."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saragan_tpu.config import Config
from saragan_tpu.core import filter_params, intersect_restore, param_count
from saragan_tpu.models import get_architecture


def tiny_cfg(**kw):
    defaults = dict(
        architecture="pgan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 16, 16, 16)",
        latent_dim=32,
        base_batch_size=4,
        kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
        filter_spec=[[16, 16], [8, 8], [4, 4]],
        noise_stddev=0.0,
    )
    defaults.update(kw)
    return Config(**defaults).finalize()


@pytest.fixture(scope="module")
def arch():
    return get_architecture("pgan")


def test_phase1_shapes(arch, rng):
    cfg = tiny_cfg()
    params = arch.init(rng, phase=1, cfg=cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
    img = arch.generator(params, z, 1.0, phase=1, cfg=cfg)
    assert img.shape == (2, 1, 4, 4, 4)
    score = arch.discriminator(params, img, 1.0, phase=1, cfg=cfg)
    assert score.shape == (2, 1)


def test_phase3_shapes(arch, rng):
    cfg = tiny_cfg()
    params = arch.init(rng, phase=3, cfg=cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
    img = arch.generator(params, z, 0.5, phase=3, cfg=cfg)
    assert img.shape == (2, 1, 16, 16, 16)
    score = arch.discriminator(params, img, 0.5, phase=3, cfg=cfg)
    assert score.shape == (2, 1)


def test_param_names_match_reference_scopes(arch, rng):
    cfg = tiny_cfg()
    params = arch.init(rng, phase=2, cfg=cfg)
    names = set(params)
    expected = {
        "generator/generator_in/dense/weight",
        "generator/generator_in/dense/bias",
        "generator/generator_in/conv/weight",
        "generator/generator_in/conv/bias",
        "generator/generator_block_2/conv_1/weight",
        "generator/generator_block_2/conv_1/bias",
        "generator/generator_block_2/conv_2/weight",
        "generator/generator_block_2/conv_2/bias",
        "generator/to_rgb_1/weight",
        "generator/to_rgb_1/bias",
        "generator/to_rgb_2/weight",
        "generator/to_rgb_2/bias",
        "discriminator/from_rgb_2/weight",
        "discriminator/from_rgb_2/bias",
        "discriminator/from_rgb_1/weight",
        "discriminator/from_rgb_1/bias",
        "discriminator/discriminator_block_2/conv_1/weight",
        "discriminator/discriminator_block_2/conv_1/bias",
        "discriminator/discriminator_block_2/conv_2/weight",
        "discriminator/discriminator_block_2/conv_2/bias",
        "discriminator/discriminator_out/weight",
        "discriminator/discriminator_out/bias",
        "discriminator/discriminator_out/dense_1/weight",
        "discriminator/discriminator_out/dense_1/bias",
        "discriminator/discriminator_out/dense_2/weight",
        "discriminator/discriminator_out/dense_2/bias",
    }
    assert names == expected


def test_param_count_formula(arch, rng):
    """Hand-computed parameter count for the tiny spec at phase 1."""
    cfg = tiny_cfg()
    params = arch.init(rng, phase=1, cfg=cfg)
    # G: dense 32 -> 64*16=1024 (+1024 b), conv 3^3*16*16 (+16), to_rgb 1*16*1 (+1)
    g_expected = 32 * 1024 + 1024 + 27 * 16 * 16 + 16 + 16 + 1
    assert param_count(params, "generator") == g_expected
    # D: from_rgb 1*1*16 (+16), head conv 27*16*16 (+16),
    #    dense_1 (16*4*4*4)*32 (+32), dense_2 32*1 (+1)
    d_expected = 16 + 16 + 27 * 16 * 16 + 16 + 1024 * 32 + 32 + 32 + 1
    assert param_count(params, "discriminator") == d_expected


def test_alpha_blend_endpoints(arch, rng):
    """alpha=1 -> pure upsampled prev-resolution to_rgb; alpha=0 -> new path."""
    cfg = tiny_cfg()
    params = arch.init(rng, phase=2, cfg=cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
    img_a0 = arch.generator(params, z, 0.0, phase=2, cfg=cfg)
    img_a1 = arch.generator(params, z, 1.0, phase=2, cfg=cfg)
    img_mid = arch.generator(params, z, 0.3, phase=2, cfg=cfg)
    np.testing.assert_allclose(
        np.asarray(img_mid),
        0.3 * np.asarray(img_a1) + 0.7 * np.asarray(img_a0),
        rtol=1e-4,
        atol=1e-5,
    )
    # alpha=1 output must be 2x-nearest-upsampled (constant over 2^3 blocks)
    a1 = np.asarray(img_a1)
    np.testing.assert_allclose(a1[..., ::2, ::2, ::2], a1[..., 1::2, 1::2, 1::2], rtol=1e-5)


def test_phase_growth_partial_restore(arch, rng):
    """Phase-2 init + phase-1 checkpoint restore keeps new layers random and
    restores shared layers exactly (reference utils.py:75-104 semantics)."""
    cfg = tiny_cfg()
    p1 = arch.init(rng, phase=1, cfg=cfg)
    # pretend p1 was trained: perturb
    trained = {k: v + 1.0 for k, v in p1.items()}
    p2 = arch.init(jax.random.PRNGKey(9), phase=2, cfg=cfg)
    restored = intersect_restore(p2, trained)
    for k in trained:
        if k in p2:
            np.testing.assert_array_equal(np.asarray(restored[k]), np.asarray(trained[k]))
    new_keys = set(p2) - set(trained)
    assert "generator/generator_block_2/conv_1/weight" in new_keys
    for k in new_keys:
        np.testing.assert_array_equal(np.asarray(restored[k]), np.asarray(p2[k]))


def test_same_layer_same_init_across_phases(arch):
    """A layer existing in both phases gets identical init from the same seed
    (order/phase independence of name-hashed RNG)."""
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(3)
    p1 = arch.init(key, phase=1, cfg=cfg)
    p2 = arch.init(key, phase=2, cfg=cfg)
    for k in p1:
        assert k in p2 or k.startswith(("generator/to_rgb_1", "discriminator/from_rgb_1"))
    np.testing.assert_array_equal(
        np.asarray(p1["generator/generator_in/dense/weight"]),
        np.asarray(p2["generator/generator_in/dense/weight"]),
    )


def test_pgan_2d(arch, rng):
    cfg = Config(
        architecture="pgan",
        start_shape="(3, 4, 4)",
        final_shape="(3, 16, 16)",
        latent_dim=16,
        kernel_spec=[[[], [3, 3]], [[3, 3], [3, 3]], [[3, 3], [3, 3]]],
        filter_spec=[[8, 8], [8, 8], [4, 4]],
        conv_kernel_size=(3, 3),
        noise_stddev=0.0,
    ).finalize()
    params = arch.init(rng, phase=2, cfg=cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    img = arch.generator(params, z, 0.5, phase=2, cfg=cfg)
    assert img.shape == (2, 3, 8, 8)
    score = arch.discriminator(params, img, 0.5, phase=2, cfg=cfg)
    assert score.shape == (2, 1)


def test_bf16_forward(arch, rng):
    cfg = tiny_cfg()
    params = arch.init(rng, phase=2, cfg=cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim), jnp.bfloat16)
    img = arch.generator(params, z, 0.5, phase=2, cfg=cfg)
    assert img.dtype == jnp.bfloat16
    score = arch.discriminator(params, img, 0.5, phase=2, cfg=cfg)
    assert score.dtype == jnp.bfloat16


def test_jit_forward(arch, rng):
    cfg = tiny_cfg()
    params = arch.init(rng, phase=2, cfg=cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
    gen = jax.jit(lambda p, z, a: arch.generator(p, z, a, phase=2, cfg=cfg))
    img = gen(params, z, 0.5)
    assert img.shape == (2, 1, 8, 8, 8)
