"""Space-to-depth channel-packing conv engine (SARAGAN_CONV3D=s2d).

The exact rewrite the BASELINE.md lane-closure argument does not cover
(VERDICT r4 item 1b): folding 2x2x2 spatial blocks into channels
manufactures the output channels the argument says "do not exist"
(C -> 8C, F -> 8F).  These tests pin exactness of the rewrite — forward,
first-order, and GP-style second-order gradients — against the direct
conv oracle, plus the dispatch/applicability gating and a full train-step
equivalence under the engine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saragan_tpu.ops import core

pytestmark = pytest.mark.smoke


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize(
    "kernel,cin,cout,spatial",
    [
        ((3, 3, 3), 8, 16, (8, 8, 8)),
        ((3, 3, 3), 1, 8, (2, 4, 4)),  # from_rgb shape: C=1, min depth
        ((5, 5, 5), 4, 8, (8, 12, 16)),  # NAS kernel 5, anisotropic volume
        ((7, 7, 7), 2, 4, (8, 8, 8)),  # NAS kernel 7
        ((3, 1, 5), 8, 8, (4, 6, 10)),  # anisotropic kernel_spec entry
    ],
)
def test_s2d_matches_direct_f64(kernel, cin, cout, spatial, np_rng, x64):
    x = jnp.asarray(np_rng.normal(size=(2, cin, *spatial)), jnp.float64)
    w = jnp.asarray(np_rng.normal(size=(*kernel, cin, cout)), jnp.float64)
    y0 = core._conv_direct(x, w)
    y1 = core._conv3d_s2d(x, w)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-12)


def test_s2d_grads_match_direct_f64(np_rng, x64):
    """First-order and GP-style grad-of-grad equality: the WGAN-GP loss
    differentiates the D input gradient, so the engine must be exact
    through second order (reference loss.py:133-140 double backward)."""
    x = jnp.asarray(np_rng.normal(size=(2, 4, 4, 4, 4)), jnp.float64)
    w = jnp.asarray(np_rng.normal(size=(3, 3, 3, 4, 8)), jnp.float64)

    def loss(conv):
        return lambda x, w: jnp.sum(jnp.tanh(conv(x, w)))

    for arg in (0, 1):
        g0 = jax.grad(loss(core._conv_direct), arg)(x, w)
        g1 = jax.grad(loss(core._conv3d_s2d), arg)(x, w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-12)

    def gp(conv):
        def f(w):
            gx = jax.grad(lambda x: jnp.sum(jnp.tanh(conv(x, w))))(x)
            return jnp.sum(gx**2)

        return jax.grad(f)(w)

    np.testing.assert_allclose(
        np.asarray(gp(core._conv3d_s2d)), np.asarray(gp(core._conv_direct)),
        atol=1e-10,
    )


def test_fold_unfold_roundtrip(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 3, 4, 6, 8)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(core._s2d_unfold(core._s2d_fold(x))), np.asarray(x)
    )


def test_s2d_applicability_gating():
    w3 = jnp.zeros((3, 3, 3, 8, 16))
    w1 = jnp.zeros((1, 1, 1, 8, 16))
    x_even = jnp.zeros((1, 8, 4, 4, 4))
    x_odd = jnp.zeros((1, 8, 4, 5, 4))
    x_wide = jnp.zeros((1, 64, 4, 4, 4))
    assert core._s2d_applicable(x_even, w3)
    assert not core._s2d_applicable(x_even, w1)  # 1x1x1: nothing to gain
    assert not core._s2d_applicable(x_odd, w3)  # odd spatial dim
    assert not core._s2d_applicable(x_wide, w3)  # folded C > 128 lanes


def test_conv_apply_dispatches_s2d(monkeypatch, np_rng):
    monkeypatch.setattr(core, "CONV3D_ALGORITHM", "s2d")
    x = jnp.asarray(np_rng.normal(size=(1, 8, 4, 4, 4)), jnp.float32)
    w = jnp.asarray(np_rng.normal(size=(3, 3, 3, 8, 8)), jnp.float32) * 0.1
    y = core.conv_apply(x, w)
    y0 = core._conv_direct(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0), atol=1e-5)
    # inapplicable shapes (odd spatial) fall back to direct without error
    x_odd = jnp.asarray(np_rng.normal(size=(1, 8, 4, 5, 4)), jnp.float32)
    y_odd = core.conv_apply(x_odd, w)
    assert y_odd.shape == (1, 8, 4, 5, 4)


def test_full_train_step_equivalent_under_s2d(monkeypatch):
    """One full WGAN-GP train step under the s2d engine matches the direct
    engine to f32 tolerance (same params, batch, key) — the engine swaps
    only the conv formulation, nothing else."""
    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    cfg = Config(
        architecture="pgan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 8, 8, 8)",
        latent_dim=16,
        base_batch_size=4,
        kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    ).finalize()
    arch = get_architecture("pgan")
    real = jnp.asarray(
        np.random.default_rng(3).normal(size=(4, 1, 8, 8, 8)), jnp.float32
    )
    key = jax.random.PRNGKey(7)

    outs = {}
    for algo in ("direct", "s2d"):
        monkeypatch.setattr(core, "CONV3D_ALGORITHM", algo)
        state, (g_opt, d_opt) = init_train_state(
            arch, jax.random.PRNGKey(0), phase=2, cfg=cfg
        )
        step = make_train_step(arch, cfg, 2, g_opt, d_opt)
        state, metrics = jax.jit(step)(state, real, key, 0.5, 1e-3, 1e-3)
        outs[algo] = (float(metrics.gen_loss), float(metrics.disc_loss))
    np.testing.assert_allclose(outs["s2d"], outs["direct"], rtol=2e-4, atol=2e-4)
