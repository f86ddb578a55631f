"""Cross-architecture tests: every registered model family builds, runs
forward in both networks, produces correct shapes, and trains one step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saragan_tpu.config import Config
from saragan_tpu.models import get_architecture
from saragan_tpu.train import init_train_state, make_train_step

ARCHS = ["pgan", "pgan2", "pgandeep", "stylegan", "stylegan2", "surfgan"]


def cfg_for(arch, phase=2, **kw):
    defaults = dict(
        architecture=arch,
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 32, 32, 32)",
        starting_phase=phase,
        ending_phase=phase,
        latent_dim=16,
        base_batch_size=4,
        network_size="xxs",
        kernel_spec=[
            [[], [3, 3, 3]],
            [[3, 3, 3], [3, 3, 3]],
            [[3, 3, 3], [3, 3, 3]],
        ],
        filter_spec=[[8, 8], [8, 8], [4, 4]],
        loss_fn="wgan",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    )
    defaults.update(kw)
    return Config(**defaults).finalize()


@pytest.mark.parametrize("arch_name", ARCHS)
def test_forward_shapes(arch_name, rng):
    phase = 1 if arch_name == "stylegan2" else 2
    cfg = cfg_for(arch_name, phase=phase)
    arch = get_architecture(arch_name)
    params = arch.init(rng, phase=phase, cfg=cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.latent_dim))
    img = arch.generator(params, z, 0.5, phase=phase, cfg=cfg, rng=jax.random.PRNGKey(2))
    size = 4 * 2 ** (phase - 1)
    assert img.shape == (4, 1, size, size, size), arch_name
    score = arch.discriminator(params, img, 0.5, phase=phase, cfg=cfg)
    assert score.shape == (4, 1), arch_name
    assert np.all(np.isfinite(np.asarray(img)))
    assert np.all(np.isfinite(np.asarray(score)))


@pytest.mark.parametrize("arch_name", ARCHS)
def test_one_train_step(arch_name):
    phase = 1 if arch_name == "stylegan2" else 2
    cfg = cfg_for(arch_name, phase=phase)
    arch = get_architecture(arch_name)
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    step = jax.jit(make_train_step(arch, cfg, phase, g_opt, d_opt))
    size = 4 * 2 ** (phase - 1)
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, size, size, size))
    new_state, metrics = step(state, real, jax.random.PRNGKey(5), 0.5, 1e-3, 1e-3)
    assert np.isfinite(float(metrics.gen_loss)), arch_name
    assert np.isfinite(float(metrics.disc_loss)), arch_name
    # at least one generator parameter moved
    moved = any(
        not np.allclose(np.asarray(new_state.g_params[k]), np.asarray(state.g_params[k]))
        for k in state.g_params
    )
    assert moved, arch_name


def test_stylegan_styles_and_truncation(rng):
    """stylegan: 2*phase styles, truncation always on; deterministic eval."""
    cfg = cfg_for("stylegan", phase=2)
    arch = get_architecture("stylegan")
    params = arch.init(rng, phase=2, cfg=cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
    a = arch.generator(params, z, 0.0, phase=2, cfg=cfg, train=False)
    b = arch.generator(params, z, 0.0, phase=2, cfg=cfg, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "generator/d_z_avg" in params
    assert "generator/g_mapping/dense_7/weight" in params
    # noise params exist for restore compatibility
    assert any("noise_strength" in k for k in params)


def test_surfgan_conditioning(rng):
    cfg = cfg_for("surfgan", phase=2, num_labels=3)
    arch = get_architecture("surfgan")
    params = arch.init(rng, phase=2, cfg=cfg)
    assert "generator/g_mapping/conditioning/weight" in params
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
    cond = jax.nn.one_hot(jnp.asarray([0, 2]), 3)
    img = arch.generator(params, z, 0.5, phase=2, cfg=cfg, rng=jax.random.PRNGKey(2),
                         conditioning=cond)
    assert img.shape == (2, 1, 8, 8, 8)
    score = arch.discriminator(params, img, 0.5, phase=2, cfg=cfg, conditioning=cond)
    assert score.shape == (2, 1)


def test_pgan2_skip_sum_alpha(rng):
    """pgan2 top-level rgb is weighted (1 - alpha) on top of the upscaled
    skip chain: alpha=1 must equal the pure skip chain."""
    cfg = cfg_for("pgan2", phase=2)
    arch = get_architecture("pgan2")
    params = arch.init(rng, phase=2, cfg=cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
    img_a0 = arch.generator(params, z, 0.0, phase=2, cfg=cfg)
    img_a1 = arch.generator(params, z, 1.0, phase=2, cfg=cfg)
    img_mid = arch.generator(params, z, 0.25, phase=2, cfg=cfg)
    np.testing.assert_allclose(
        np.asarray(img_mid), 0.25 * np.asarray(img_a1) + 0.75 * np.asarray(img_a0),
        rtol=1e-4, atol=1e-5,
    )


def test_pgandeep_three_layer_spec(rng):
    """pgandeep honors per-phase layer counts from the spec."""
    cfg = cfg_for(
        "pgandeep",
        phase=2,
        kernel_spec=[
            [[], [3, 3, 3], [3, 3, 3]],
            [[3, 3, 3], [3, 3, 3], [1, 1, 1]],
        ],
        filter_spec=[[8, 8, 8], [8, 8, 4]],
    )
    arch = get_architecture("pgandeep")
    params = arch.init(rng, phase=2, cfg=cfg)
    assert "generator/generator_block_2/conv_3/weight" in params
    assert "generator/generator_in/conv_2/weight" in params
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
    img = arch.generator(params, z, 0.5, phase=2, cfg=cfg)
    score = arch.discriminator(params, img, 0.5, phase=2, cfg=cfg)
    assert score.shape == (2, 1)


def test_modulated_conv_demodulation():
    """Demodulated modulated conv output has ~unit per-sample channel std for
    unit-normal input (the demodulation contract)."""
    from saragan_tpu.core import Scope
    from saragan_tpu.models.style_ops import modulated_conv

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8, 8))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    params = {}
    scope = Scope(params, init=True, rng=rng)
    y = modulated_conv(scope, x, z, 8, (3, 3, 3), "linear")
    assert y.shape == (2, 8, 8, 8, 8)
    std = float(jnp.std(y))
    assert 0.5 < std < 2.0


# ---------------------------------------------------------------------------
# 2D variants (reference SURFGAN_2D mirrors the families in 2D NCHW; our ops
# and models are rank-generic, so every family must also build and train at a
# 2D base shape — SURVEY C4 + the 2D signature rows of §2)
# ---------------------------------------------------------------------------


def cfg_for_2d(arch, phase=2, **kw):
    defaults = dict(
        architecture=arch,
        start_shape="(1, 4, 4)",
        final_shape="(1, 32, 32)",
        starting_phase=phase,
        ending_phase=phase,
        latent_dim=16,
        base_batch_size=4,
        network_size="xxs",
        kernel_spec=[[[], [3, 3]], [[3, 3], [3, 3]], [[3, 3], [3, 3]]],
        filter_spec=[[8, 8], [8, 8], [4, 4]],
        loss_fn="wgan",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    )
    defaults.update(kw)
    return Config(**defaults).finalize()


@pytest.mark.parametrize("arch_name", ARCHS)
def test_forward_shapes_2d(arch_name, rng):
    phase = 1 if arch_name == "stylegan2" else 2
    cfg = cfg_for_2d(arch_name, phase=phase)
    arch = get_architecture(arch_name)
    params = arch.init(rng, phase=phase, cfg=cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.latent_dim))
    img = arch.generator(params, z, 0.5, phase=phase, cfg=cfg, rng=jax.random.PRNGKey(2))
    size = 4 * 2 ** (phase - 1)
    assert img.shape == (4, 1, size, size), arch_name
    score = arch.discriminator(params, img, 0.5, phase=phase, cfg=cfg)
    assert score.shape == (4, 1), arch_name
    assert np.all(np.isfinite(np.asarray(img)))
    assert np.all(np.isfinite(np.asarray(score)))


@pytest.mark.parametrize("arch_name", ARCHS)
def test_one_train_step_2d(arch_name):
    phase = 1 if arch_name == "stylegan2" else 2
    cfg = cfg_for_2d(arch_name, phase=phase)
    arch = get_architecture(arch_name)
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    step = jax.jit(make_train_step(arch, cfg, phase, g_opt, d_opt))
    size = 4 * 2 ** (phase - 1)
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, size, size))
    new_state, metrics = step(state, real, jax.random.PRNGKey(5), 0.5, 1e-3, 1e-3)
    assert np.isfinite(float(metrics.gen_loss)), arch_name
    assert np.isfinite(float(metrics.disc_loss)), arch_name


def test_stylegan_dlatent_avg_tracks_w_mean():
    """d_z_avg must move toward the mapping's w mean each train step via the
    refresh_state hook (reference stylegan/generator.py:29-37 tf.assign) and
    must NOT be gradient-trained (stop_gradient in apply_truncation)."""
    cfg = cfg_for("stylegan", phase=2)
    arch = get_architecture("stylegan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
    assert arch.refresh_state is not None
    step = jax.jit(make_train_step(arch, cfg, 2, g_opt, d_opt))
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 8, 8, 8))
    avg0 = np.asarray(state.g_params["generator/d_z_avg"])
    np.testing.assert_array_equal(avg0, 0.0)
    state2, _ = step(state, real, jax.random.PRNGKey(5), 0.5, 1e-3, 1e-3)
    avg1 = np.asarray(state2.g_params["generator/d_z_avg"])
    assert not np.allclose(avg1, 0.0), "d_z_avg was not updated by refresh_state"
    # beta-0.995 EMA from zeros: first update = 0.005 * batch_mean(w) — small
    assert np.abs(avg1).max() < 0.1
    # and several steps keep it finite and slowly moving
    state3, _ = step(state2, real, jax.random.PRNGKey(6), 0.5, 1e-3, 1e-3)
    avg2 = np.asarray(state3.g_params["generator/d_z_avg"])
    assert np.all(np.isfinite(avg2))
    assert not np.array_equal(avg1, avg2)


@pytest.mark.parametrize("arch_name", ["stylegan2", "surfgan"])
def test_style_family_refresh_state_registered(arch_name):
    arch = get_architecture(arch_name)
    assert arch.refresh_state is not None
    assert get_architecture("pgan").refresh_state is None


@pytest.mark.parametrize("arch_name", ["pgan", "stylegan"])
def test_abstract_init_matches_eager_forward(arch_name):
    """arch.init traces the init forward abstractly (models.common.
    abstract_init_forward) so no activation is materialized — previously an
    EAGER f32 full-resolution forward ran just to create params, which at
    phase 8 (128x512x512) exceeded HBM by itself (BASELINE.md round 3).
    Params must come out CONCRETE and bitwise-equal to the eager path
    (Scope.get derives each param from fold_in(rng, crc32(name)), so the
    surrounding trace must not change anything)."""
    import importlib

    from saragan_tpu.core import Scope
    from saragan_tpu.models.common import spectral_iters

    cfg = cfg_for(arch_name)
    phase = 2
    arch = get_architecture(arch_name)
    rng = jax.random.PRNGKey(7)
    new = arch.init(rng, phase=phase, cfg=cfg)
    for k, v in new.items():
        assert "Tracer" not in type(v).__name__, k

    mod = importlib.import_module(f"saragan_tpu.models.{arch_name}")
    params = {}
    if arch_name == "pgan":
        g_rng, d_rng = jax.random.split(rng)
        mod._generator(Scope(params, init=True, rng=g_rng),
                       jnp.zeros((1, cfg.latent_dim)), 1.0, phase, cfg, cfg.leakiness)
        mod._discriminator(Scope(params, init=True, rng=d_rng, spectral=spectral_iters(cfg)),
                           jnp.zeros(cfg.current_shape(phase, 1)), 1.0, phase, cfg, cfg.leakiness)
    else:
        g_rng, d_rng, n_rng = jax.random.split(rng, 3)
        mod._generator(Scope(params, init=True, rng=g_rng),
                       jnp.zeros((1, cfg.latent_dim)), 1.0, phase, cfg, cfg.leakiness, n_rng, True)
        mod._discriminator(Scope(params, init=True, rng=d_rng, spectral=spectral_iters(cfg)),
                           jnp.zeros(cfg.current_shape(phase, 1)), 1.0, phase, cfg, cfg.leakiness)
    assert set(new) == set(params)
    for k in new:
        np.testing.assert_array_equal(np.asarray(new[k]), np.asarray(params[k]), err_msg=k)
