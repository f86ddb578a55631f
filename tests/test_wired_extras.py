"""Round-2 wiring: spectral norm through get_weight, LAMB/RAdam/AdamW from
Config, and gradient accumulation inside the train step (VERDICT r1 item 5;
reference networks/ops.py:111-127, SURFGAN_2D/main.py:206-212,
SURFGAN_2D/optim.py:95-160)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saragan_tpu.cli import build_parser, config_from_args
from saragan_tpu.config import Config
from saragan_tpu.models import get_architecture
from saragan_tpu.optim.accumulate import grad_accumulate
from saragan_tpu.train import init_train_state, make_train_step


def tiny_cfg(**kw):
    defaults = dict(
        architecture="pgan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 16, 16, 16)",
        latent_dim=16,
        base_batch_size=4,
        kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
        filter_spec=[[8, 8], [8, 8], [4, 4]],
        loss_fn="wgan",
        gp_weight=1.0,
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    )
    defaults.update(kw)
    return Config(**defaults).finalize()


# ---------------------------------------------------------------------------
# spectral norm
# ---------------------------------------------------------------------------


def test_spectral_norm_creates_u_and_normalizes():
    cfg = tiny_cfg(use_spectral_norm=True, spectral_iterations=25)
    arch = get_architecture("pgan")
    params = arch.init(jax.random.PRNGKey(0), phase=1, cfg=cfg)
    u_names = [k for k in params if k.endswith("_u")]
    assert u_names, "spectral norm must persist power-iteration vectors"
    assert all(k.startswith("discriminator/") for k in u_names)

    # effective spectral radius of a normalized weight is ~1: reconstruct the
    # effective D conv weight by calling get_weight under the same scope
    from saragan_tpu.core import Scope
    from saragan_tpu.ops import core as ops_core

    name = "discriminator/discriminator_out/weight"
    scope = Scope(params, "discriminator/discriminator_out", spectral=25)
    w = ops_core.get_weight(scope, params[name].shape, "leaky_relu", param=0.2)
    sigma = np.linalg.svd(np.asarray(w).reshape(-1, w.shape[-1]), compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, rtol=5e-3)  # f32 power iteration


def test_spectral_norm_train_step_runs_and_u_frozen():
    cfg = tiny_cfg(use_spectral_norm=True)
    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=1, cfg=cfg)
    step = jax.jit(make_train_step(arch, cfg, 1, g_opt, d_opt))
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 4, 4, 4))
    u_before = {k: np.asarray(v) for k, v in state.d_params.items() if k.endswith("_u")}
    state2, m = step(state, real, jax.random.PRNGKey(2), 0.0, 1e-3, 1e-3)
    assert np.isfinite(float(m.gen_loss)) and np.isfinite(float(m.disc_loss))
    # u moves ONLY by the per-step power-iteration refresh (the reference's
    # non-trainable u assignment, ops.py:96-104) — never by a gradient step:
    # re-deriving it from (u_before, post-update weight) must reproduce it.
    from saragan_tpu.ops.core import refresh_spectral_u

    weights = {k[: -len("_u")]: state2.d_params[k[: -len("_u")]] for k in u_before}
    expected = refresh_spectral_u({**weights, **u_before},
                                  iterations=cfg.spectral_iterations)
    for k in u_before:
        np.testing.assert_allclose(
            np.asarray(state2.d_params[k]), np.asarray(expected[k]), rtol=1e-5, atol=1e-6
        )
    # non-u D weights did move
    moved = [
        k for k in state2.d_params
        if not k.endswith("_u")
        and not np.array_equal(np.asarray(state2.d_params[k]), np.asarray(state.d_params[k]))
    ]
    assert moved


# ---------------------------------------------------------------------------
# optimizer surface
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["LAMB", "RAdam", "AdamW", "LARS"])
def test_extra_optimizers_reachable_from_config(name):
    cfg = tiny_cfg(optimizer="Adam", d_use_different_optimizer=True, d_optimizer=name,
                   weight_decay=0.001)
    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=1, cfg=cfg)
    assert d_opt.name == name
    step = jax.jit(make_train_step(arch, cfg, 1, g_opt, d_opt))
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 4, 4, 4))
    state2, m = step(state, real, jax.random.PRNGKey(2), 0.0, 1e-3, 1e-3)
    assert np.isfinite(float(m.disc_loss))


def test_cli_accepts_2d_extras():
    argv = [
        "pgan2", "/data", "--start_shape", "(3, 4, 4)", "--final_shape", "(3, 32, 32)",
        "--starting_phase", "1", "--ending_phase", "2", "--latent_dim", "128",
        "--noise_stddev", "0.0",
        "--optimizer", "Adam", "--d_use_different_optimizer", "--d_optimizer", "LAMB",
        "--weight_decay", "0.004", "--gradient_accumulation", "4",
        "--use_spectral_norm", "--spectral_iterations", "2",
        "--inception_weights", "None", "--allow_uncalibrated_fid",
    ]
    cfg = config_from_args(build_parser().parse_args(argv)).finalize()
    assert cfg.d_optimizer == "LAMB" and cfg.optimizer == "Adam"
    assert cfg.gradient_accumulation == 4
    assert cfg.use_spectral_norm and cfg.spectral_iterations == 2
    assert cfg.weight_decay == 0.004 and cfg.d_weight_decay == 0.004
    assert cfg.allow_uncalibrated_fid


# ---------------------------------------------------------------------------
# gradient accumulation
# ---------------------------------------------------------------------------


def test_grad_accumulate_matches_manual_average():
    def grad_fn(mb, k):
        g = {"w": jnp.sum(mb) * jnp.ones((3,))}
        return g, jnp.mean(mb)

    batch = jnp.arange(8.0).reshape(8, 1)
    rng = jax.random.PRNGKey(0)
    g, aux = jax.jit(lambda b, k: grad_accumulate(grad_fn, b, k, 4))(batch, rng)
    manual = np.mean([float(jnp.sum(batch[i * 2:(i + 1) * 2])) for i in range(4)])
    np.testing.assert_allclose(np.asarray(g["w"]), manual)
    np.testing.assert_allclose(float(aux), float(jnp.mean(batch)), rtol=1e-6)


def test_accumulated_step_exactly_averages_micro_steps():
    """Oracle: with SGD (stateless, update = -lr * grad), the accum=2 step's
    param delta must equal the AVERAGE of the two micro-batch SGD deltas
    computed by two accum=1 steps on the same micro-batches with the same
    per-micro rngs (grad_accumulate uses jax.random.split(rng, K))."""
    kw = dict(optimizer="SGD", adam_beta1=None, adam_beta2=None)
    cfg1 = tiny_cfg(**kw)
    cfgK = tiny_cfg(gradient_accumulation=2, **kw)
    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=1, cfg=cfg1)
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 4, 4, 4))
    lr = 1e-2
    step1 = jax.jit(make_train_step(arch, cfg1, 1, g_opt, d_opt))
    stepK = jax.jit(make_train_step(arch, cfgK, 1, g_opt, d_opt))
    rng = jax.random.PRNGKey(2)
    sK, mK = stepK(state, real, rng, 0.0, lr, lr)
    r0, r1 = jax.random.split(rng, 2)
    sa, ma = step1(state, real[:2], r0, 0.0, lr, lr)
    sb, mb = step1(state, real[2:], r1, 0.0, lr, lr)
    for k in state.g_params:
        dK = np.asarray(sK.g_params[k], np.float64) - np.asarray(state.g_params[k], np.float64)
        da = np.asarray(sa.g_params[k], np.float64) - np.asarray(state.g_params[k], np.float64)
        db = np.asarray(sb.g_params[k], np.float64) - np.asarray(state.g_params[k], np.float64)
        # atol covers f32 cancellation: deltas are (p_new - p_old) with p ~ O(1)
        np.testing.assert_allclose(dK, (da + db) / 2, rtol=2e-3, atol=5e-7, err_msg=k)
    # losses are the micro-average too
    np.testing.assert_allclose(
        float(mK.gen_loss), (float(ma.gen_loss) + float(mb.gen_loss)) / 2, rtol=1e-4
    )


def test_lamb_weight_decay_excludes_bias_and_spectral_u():
    """LAMB/AdamW decay must not touch biases (reference SURFGAN_2D/
    optim.py:281-293 exclude_from_weight_decay) nor spectral-norm `u`
    vectors (non-trainable in the reference): u's norm stays exactly 1 (a
    pure power-iteration update) — weight decay would shrink it each step."""
    cfg = tiny_cfg(use_spectral_norm=True, optimizer="Adam",
                   d_use_different_optimizer=True, d_optimizer="LAMB",
                   weight_decay=0.5)  # huge decay so a violation is visible
    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=1, cfg=cfg)
    step = jax.jit(make_train_step(arch, cfg, 1, g_opt, d_opt))
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 4, 4, 4))
    u_keys = [k for k in state.d_params if k.endswith("_u")]
    assert u_keys, "expected spectral-norm u params in D"
    state2 = state
    for i in range(3):
        state2, m = step(state2, real, jax.random.PRNGKey(2 + i), 0.0, 1e-3, 1e-3)
    assert np.isfinite(float(m.disc_loss))
    for k in u_keys:
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(state2.d_params[k])), 1.0, rtol=1e-5
        )


def test_decay_mask_shape():
    from saragan_tpu.optim.factory import _decay_mask

    params = {"d/conv/weight": 1, "d/conv/bias": 1, "d/conv/weight_u": 1,
              "g/noise_strength": 1}
    mask = _decay_mask(params)
    assert mask == {"d/conv/weight": True, "d/conv/bias": False,
                    "d/conv/weight_u": False, "g/noise_strength": False}
