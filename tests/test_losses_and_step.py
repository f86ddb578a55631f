"""Loss + train-step tests: WGAN-GP grad-of-grad, gradient isolation,
freeze semantics, EMA, both optim strategies, bf16."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saragan_tpu import losses
from saragan_tpu.config import Config
from saragan_tpu.models import get_architecture
from saragan_tpu.optim.freeze import apply_freeze_names
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


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    arch = get_architecture("pgan")
    rng = jax.random.PRNGKey(0)
    state, (g_opt, d_opt) = init_train_state(arch, rng, phase=1, cfg=cfg)
    return cfg, arch, state, g_opt, d_opt


def _bound(arch, cfg, phase=1, alpha=0.0):
    gen = lambda p, z, k=None: arch.generator(p, z, alpha, phase=phase, cfg=cfg, rng=k)
    disc = lambda p, x: arch.discriminator(p, x, alpha, phase=phase, cfg=cfg)
    return gen, disc


def test_wgan_gp_slope_one_for_linear_disc(setup):
    """On a discriminator that is exactly linear with unit-norm gradient,
    GP must vanish: verify the grad-of-grad machinery computes true slopes."""
    cfg, arch, state, *_ = setup

    # Fake "discriminator": D(x) = <x, v>/||v|| -> per-sample grad norm == 1.
    v = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 4, 4, 4))
    v = v / jnp.sqrt(jnp.sum(v**2))

    def disc(params, x):
        return jnp.sum(x * v, axis=(1, 2, 3, 4), keepdims=False)[:, None]

    def gen(params, z, rng=None):
        return jnp.zeros((z.shape[0], 1, 4, 4, 4))

    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 4, 4, 4))
    out = losses.forward_simultaneous(
        gen, disc, {}, {"w": v}, real, jax.random.PRNGKey(5),
        latent_dim=cfg.latent_dim, loss_fn="wgan", gp_weight=1.0, noise_stddev=0.0,
        gp_full_reduction=True,
    )
    np.testing.assert_allclose(float(out.gp_loss), 0.0, atol=1e-8)


def test_gp_reference_axes_quirk(setup):
    """Simultaneous reduces over (1,2,3); discriminator-only over all axes
    (reference loss.py:140 vs :79)."""
    cfg, arch, state, *_ = setup
    gen, disc = _bound(arch, cfg)
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 4, 4, 4))
    out_quirk = losses.forward_simultaneous(
        gen, disc, state.g_params, state.d_params, real, jax.random.PRNGKey(5),
        latent_dim=cfg.latent_dim, loss_fn="wgan", gp_weight=1.0, noise_stddev=0.0,
    )
    out_full = losses.forward_simultaneous(
        gen, disc, state.g_params, state.d_params, real, jax.random.PRNGKey(5),
        latent_dim=cfg.latent_dim, loss_fn="wgan", gp_weight=1.0, noise_stddev=0.0,
        gp_full_reduction=True,
    )
    # same RNG -> same interpolates; the reductions genuinely differ
    assert not np.isclose(float(out_quirk.gp_loss), float(out_full.gp_loss))


def test_gradient_isolation(setup):
    """grad(gen_loss + disc_loss) w.r.t. d_params must equal
    grad(disc_loss) alone: the generator loss is blocked from D's params."""
    cfg, arch, state, *_ = setup
    gen, disc = _bound(arch, cfg)
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 4, 4, 4))
    rng = jax.random.PRNGKey(5)

    def total(gp, dp):
        out = losses.forward_simultaneous(
            gen, disc, gp, dp, real, rng,
            latent_dim=cfg.latent_dim, loss_fn="wgan", gp_weight=1.0, noise_stddev=0.0)
        return out.gen_loss + out.disc_loss

    def disc_only(dp):
        out = losses.forward_simultaneous(
            gen, disc, state.g_params, dp, real, rng,
            latent_dim=cfg.latent_dim, loss_fn="wgan", gp_weight=1.0, noise_stddev=0.0)
        return out.disc_loss

    def gen_only(gp):
        out = losses.forward_simultaneous(
            gen, disc, gp, state.d_params, real, rng,
            latent_dim=cfg.latent_dim, loss_fn="wgan", gp_weight=1.0, noise_stddev=0.0)
        return out.gen_loss

    g_grads, d_grads = jax.grad(total, argnums=(0, 1))(state.g_params, state.d_params)
    d_ref = jax.grad(disc_only)(state.d_params)
    g_ref = jax.grad(gen_only)(state.g_params)
    for k in d_grads:
        np.testing.assert_allclose(np.asarray(d_grads[k]), np.asarray(d_ref[k]), rtol=2e-4, atol=1e-6)
    for k in g_grads:
        np.testing.assert_allclose(np.asarray(g_grads[k]), np.asarray(g_ref[k]), rtol=2e-4, atol=1e-6)


def test_logistic_loss_values(setup):
    cfg, arch, state, *_ = setup
    gen, disc = _bound(arch, cfg)
    real = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 4, 4, 4))
    out = losses.forward_simultaneous(
        gen, disc, state.g_params, state.d_params, real, jax.random.PRNGKey(5),
        latent_dim=cfg.latent_dim, loss_fn="logistic", gp_weight=2.0, noise_stddev=0.0)
    assert np.isfinite(float(out.gen_loss)) and np.isfinite(float(out.disc_loss))
    with pytest.raises(ValueError):
        losses.forward_simultaneous(
            gen, disc, state.g_params, state.d_params, real, jax.random.PRNGKey(5),
            latent_dim=cfg.latent_dim, loss_fn="nope", gp_weight=1.0, noise_stddev=0.0)


def test_train_step_updates_params(setup):
    cfg, arch, state, g_opt, d_opt = setup
    step = jax.jit(make_train_step(arch, cfg, 1, g_opt, d_opt))
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 4, 4, 4))
    new_state, metrics = step(state, real, jax.random.PRNGKey(5), 0.0, 1e-3, 1e-3)
    changed = sum(
        int(not np.allclose(np.asarray(new_state.g_params[k]), np.asarray(state.g_params[k])))
        for k in state.g_params
    )
    assert changed == len(state.g_params)  # all G params moved
    assert np.isfinite(float(metrics.gen_loss))
    assert np.isfinite(float(metrics.max_d_norm))
    # EMA moved toward params but is not equal to them
    k = next(iter(state.g_params))
    ema_expected = cfg.ema_beta * np.asarray(state.ema[k]) + (1 - cfg.ema_beta) * np.asarray(
        new_state.g_params[k]
    )
    np.testing.assert_allclose(np.asarray(new_state.ema[k]), ema_expected, rtol=1e-5)


def test_train_step_freeze(setup):
    """Frozen (previous-phase) params and their optimizer slots stay fixed."""
    cfg, arch, state, g_opt, d_opt = setup
    state2, _ = init_train_state(arch, jax.random.PRNGKey(7), phase=2, cfg=cfg)
    prev = {**state.g_params, **state.d_params}
    cur = {**state2.g_params, **state2.d_params}
    frozen = apply_freeze_names(cur, prev)
    assert "generator/generator_in/dense/weight" in frozen
    assert "generator/generator_block_2/conv_1/weight" not in frozen

    step = jax.jit(
        make_train_step(arch, cfg, 2, g_opt, d_opt, frozen_names=frozen, freeze=True)
    )
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 8, 8, 8))
    new_state, _ = step(state2, real, jax.random.PRNGKey(5), 0.5, 1e-3, 1e-3)
    for k in state2.g_params:
        a, b = np.asarray(state2.g_params[k]), np.asarray(new_state.g_params[k])
        if k in frozen:
            np.testing.assert_array_equal(a, b)
        else:
            assert not np.allclose(a, b), k
    # optimizer slots for frozen params unchanged (adam mu stays zero)
    mu_new = new_state.g_opt.mu["generator/generator_in/dense/weight"]
    np.testing.assert_array_equal(np.asarray(mu_new), 0.0)
    mu_unfrozen = new_state.g_opt.mu["generator/generator_block_2/conv_1/weight"]
    assert float(np.abs(np.asarray(mu_unfrozen)).max()) > 0.0


def test_train_step_alternate(setup):
    cfg_alt = tiny_cfg(optim_strategy="alternate")
    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=1, cfg=cfg_alt)
    step = jax.jit(make_train_step(arch, cfg_alt, 1, g_opt, d_opt))
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 4, 4, 4))
    new_state, metrics = step(state, real, jax.random.PRNGKey(5), 0.0, 1e-3, 1e-3)
    assert np.isfinite(float(metrics.disc_loss))
    assert not np.allclose(
        np.asarray(new_state.d_params["discriminator/discriminator_out/weight"]),
        np.asarray(state.d_params["discriminator/discriminator_out/weight"]),
    )


def test_train_step_bf16(setup):
    cfg_bf = tiny_cfg(compute_dtype="bfloat16")
    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=1, cfg=cfg_bf)
    step = jax.jit(make_train_step(arch, cfg_bf, 1, g_opt, d_opt))
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 4, 4, 4))
    new_state, metrics = step(state, real, jax.random.PRNGKey(5), 0.0, 1e-3, 1e-3)
    # params stay fp32 master copies
    assert new_state.g_params["generator/generator_in/dense/weight"].dtype == jnp.float32
    assert np.isfinite(float(metrics.gen_loss))


def test_bf16_transfer_is_bit_exact_under_bf16_compute(setup):
    """The --transfer_dtype auto default: under bfloat16 compute, shipping
    the input batch as host-cast bfloat16 must produce BIT-identical results
    to shipping float32 — the step's first op casts the batch to compute
    dtype (train/step.py), so the same RNE rounding happens either way.
    This is what justifies defaulting transfer to bf16 (half the
    host->device bytes for free; BASELINE.md input-transfer A/B)."""
    import ml_dtypes

    cfg_bf = tiny_cfg(compute_dtype="bfloat16")
    assert cfg_bf.transfer_dtype == "bfloat16"  # finalize() resolves "auto"
    arch = get_architecture("pgan")
    state32, (g_opt, d_opt) = init_train_state(
        arch, jax.random.PRNGKey(0), phase=1, cfg=cfg_bf)
    state16, _ = init_train_state(
        arch, jax.random.PRNGKey(0), phase=1, cfg=cfg_bf)
    step = make_train_step(arch, cfg_bf, 1, g_opt, d_opt)
    real32 = np.asarray(
        jax.random.normal(jax.random.PRNGKey(4), (4, 1, 4, 4, 4)),
        np.float32)
    real16 = real32.astype(ml_dtypes.bfloat16)  # host-side RNE cast
    k = jax.random.PRNGKey(5)
    s32, m32 = jax.jit(step)(state32, real32, k, 0.5, 1e-3, 1e-3)
    s16, m16 = jax.jit(step)(state16, real16, k, 0.5, 1e-3, 1e-3)
    for name in s32.d_params:
        np.testing.assert_array_equal(
            np.asarray(s32.d_params[name]), np.asarray(s16.d_params[name]),
            err_msg=name)
    for name in s32.g_params:
        np.testing.assert_array_equal(
            np.asarray(s32.g_params[name]), np.asarray(s16.g_params[name]),
            err_msg=name)
    np.testing.assert_array_equal(np.asarray(m32.disc_loss),
                                  np.asarray(m16.disc_loss))


def test_transfer_dtype_auto_resolution():
    """Config.finalize resolves transfer_dtype='auto' by compute dtype:
    bf16 compute -> bf16 transfer (bit-exact), f32 compute -> f32 transfer
    (a down-cast would lose real precision). Explicit choices pass through."""
    assert tiny_cfg().transfer_dtype == "float32"  # f32 compute default
    assert tiny_cfg(compute_dtype="bfloat16").transfer_dtype == "bfloat16"
    assert tiny_cfg(transfer_dtype="float16").transfer_dtype == "float16"
    assert tiny_cfg(compute_dtype="bfloat16",
                    transfer_dtype="float32").transfer_dtype == "float32"


def test_clipping_bounds_norms():
    cfg = tiny_cfg(g_clipping=True, d_clipping=True, g_lr=1e-2, d_lr=1e-2)
    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=1, cfg=cfg)
    step = jax.jit(make_train_step(arch, cfg, 1, g_opt, d_opt))
    real = 100.0 * jax.random.normal(jax.random.PRNGKey(4), (4, 1, 4, 4, 4))
    _, metrics = step(state, real, jax.random.PRNGKey(5), 0.0, 1e-2, 1e-2)
    # post-clip per-var max norm can't exceed the global clip threshold 1.0
    assert float(metrics.max_g_norm) <= 1.0 + 1e-5
    assert float(metrics.max_d_norm) <= 1.0 + 1e-5


def test_alternate_strategy_respects_lazy_gp():
    """make_train_step(apply_gp=False) must skip the GP grad-of-grad in
    ALTERNATE mode too (it silently ran at full weight before): gp_loss is
    exactly 0 on off-steps, and the lazy weight scales gp on on-steps."""
    import jax

    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    cfg = Config(
        architecture="pgan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 8, 8, 8)",
        starting_phase=1,
        ending_phase=1,
        latent_dim=8,
        network_size="xxs",
        base_batch_size=4,
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        optim_strategy="alternate",
        lazy_gp=4,
    ).finalize()
    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=1, cfg=cfg)
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 4, 4, 4))

    step_off = jax.jit(make_train_step(arch, cfg, 1, g_opt, d_opt, apply_gp=False))
    _, m_off = step_off(state, real, jax.random.PRNGKey(2), 0.0, 1e-3, 1e-3)
    assert float(m_off.gp_loss) == 0.0

    step_on = jax.jit(make_train_step(arch, cfg, 1, g_opt, d_opt, apply_gp=True))
    _, m_on = step_on(state, real, jax.random.PRNGKey(2), 0.0, 1e-3, 1e-3)
    assert float(m_on.gp_loss) > 0.0


def test_fused_grads_matches_unfused():
    """The shared-fake-pass gradient assembly (losses.grads_simultaneous,
    cfg.fused_grads) must produce the same updates as differentiating
    gen_loss + disc_loss through forward_simultaneous."""
    arch = get_architecture("pgan")
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 8, 8, 8))
    rng = jax.random.PRNGKey(5)
    results = {}
    for fused in (True, False):
        cfg = tiny_cfg(fused_grads=fused, noise_stddev=0.02)
        state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
        step = jax.jit(make_train_step(arch, cfg, 2, g_opt, d_opt))
        new_state, metrics = step(state, real, rng, 0.5, 1e-3, 1e-3)
        results[fused] = (new_state, metrics)
    st_f, m_f = results[True]
    st_u, m_u = results[False]
    np.testing.assert_allclose(float(m_f.gen_loss), float(m_u.gen_loss), rtol=1e-5)
    np.testing.assert_allclose(float(m_f.disc_loss), float(m_u.disc_loss), rtol=1e-5)
    np.testing.assert_allclose(float(m_f.gp_loss), float(m_u.gp_loss), rtol=1e-5)
    for k in st_f.g_params:
        np.testing.assert_allclose(
            np.asarray(st_f.g_params[k]), np.asarray(st_u.g_params[k]),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )
    for k in st_f.d_params:
        np.testing.assert_allclose(
            np.asarray(st_f.d_params[k]), np.asarray(st_u.d_params[k]),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )


def test_fused_grads_raw_gradient_equality(setup):
    """grads_simultaneous == jax.grad(gen_loss + disc_loss) at the gradient
    level (tighter than the through-the-optimizer check)."""
    cfg, arch, state, *_ = setup
    gen, disc = _bound(arch, cfg)
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 4, 4, 4))
    rng = jax.random.PRNGKey(5)
    kw = dict(latent_dim=cfg.latent_dim, gp_weight=3.0, noise_stddev=0.0)

    (gg, dg), out = losses.grads_simultaneous(
        gen, disc, state.g_params, state.d_params, real, rng, **kw
    )

    def total(gp, dp):
        o = losses.forward_simultaneous(
            gen, disc, gp, dp, real, rng, loss_fn="wgan", **kw
        )
        return o.gen_loss + o.disc_loss, o

    (g_ref, d_ref), o_ref = jax.grad(total, argnums=(0, 1), has_aux=True)(
        state.g_params, state.d_params
    )
    np.testing.assert_allclose(float(out.gen_loss), float(o_ref.gen_loss), rtol=1e-6)
    np.testing.assert_allclose(float(out.disc_loss), float(o_ref.disc_loss), rtol=1e-6)
    np.testing.assert_allclose(float(out.gp_loss), float(o_ref.gp_loss), rtol=1e-6)
    for k in gg:
        np.testing.assert_allclose(np.asarray(gg[k]), np.asarray(g_ref[k]),
                                   rtol=2e-4, atol=1e-7, err_msg=k)
    for k in dg:
        np.testing.assert_allclose(np.asarray(dg[k]), np.asarray(d_ref[k]),
                                   rtol=2e-4, atol=1e-7, err_msg=k)


@pytest.mark.parametrize("arch_name", ["pgan", "surfgan"])
def test_batched_passes_matches_separate(arch_name):
    """batched_passes=True (fake+real through ONE vmap-stacked D pass) must
    reproduce the separate-pass gradients exactly — including for surfgan,
    whose discriminator uses minibatch-stddev: vmap keeps the group
    statistics within each pass, which plain concatenation would not
    (reference ops.py:313-325 strided groups)."""
    arch = get_architecture(arch_name)
    cfg = tiny_cfg(architecture=arch_name, network_size="xxs", noise_stddev=0.02)
    state, _ = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
    gen, disc = _bound(arch, cfg, phase=2, alpha=0.5)
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 8, 8, 8))
    rng = jax.random.PRNGKey(5)
    kw = dict(latent_dim=cfg.latent_dim, gp_weight=3.0, noise_stddev=0.02)

    (gg_s, dg_s), out_s = losses.grads_simultaneous(
        gen, disc, state.g_params, state.d_params, real, rng,
        batched_passes=False, **kw
    )
    (gg_b, dg_b), out_b = losses.grads_simultaneous(
        gen, disc, state.g_params, state.d_params, real, rng,
        batched_passes=True, **kw
    )
    np.testing.assert_allclose(float(out_b.gen_loss), float(out_s.gen_loss), rtol=1e-6)
    np.testing.assert_allclose(float(out_b.disc_loss), float(out_s.disc_loss), rtol=1e-6)
    np.testing.assert_allclose(float(out_b.gp_loss), float(out_s.gp_loss), rtol=1e-6)
    for k in gg_s:
        np.testing.assert_allclose(np.asarray(gg_b[k]), np.asarray(gg_s[k]),
                                   rtol=2e-4, atol=1e-7, err_msg=k)
    for k in dg_s:
        np.testing.assert_allclose(np.asarray(dg_b[k]), np.asarray(dg_s[k]),
                                   rtol=2e-4, atol=1e-7, err_msg=k)


def test_batched_passes_through_step():
    """cfg.batched_passes wired through make_train_step produces the same
    parameter updates as the default fused step."""
    arch = get_architecture("pgan")
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 8, 8, 8))
    rng = jax.random.PRNGKey(5)
    results = {}
    for batched in (True, False):
        cfg = tiny_cfg(batched_passes=batched, noise_stddev=0.02)
        state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
        step = jax.jit(make_train_step(arch, cfg, 2, g_opt, d_opt))
        new_state, metrics = step(state, real, rng, 0.5, 1e-3, 1e-3)
        results[batched] = (new_state, metrics)
    st_b, m_b = results[True]
    st_s, m_s = results[False]
    np.testing.assert_allclose(float(m_b.gen_loss), float(m_s.gen_loss), rtol=1e-5)
    np.testing.assert_allclose(float(m_b.disc_loss), float(m_s.disc_loss), rtol=1e-5)
    for k in st_b.d_params:
        np.testing.assert_allclose(
            np.asarray(st_b.d_params[k]), np.asarray(st_s.d_params[k]),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )


def test_gp_revfwd_matches_revrev(setup):
    """gp_grad_mode='revfwd' (reverse-over-forward: grad of a jvp in the
    frozen P'(g) direction) must equal the default reverse-over-reverse
    grad-of-grad — same losses, same G and D gradients."""
    cfg, arch, state, *_ = setup
    gen, disc = _bound(arch, cfg)
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 4, 4, 4))
    rng = jax.random.PRNGKey(5)
    kw = dict(latent_dim=cfg.latent_dim, gp_weight=3.0, noise_stddev=0.02)

    (gg_rr, dg_rr), out_rr = losses.grads_simultaneous(
        gen, disc, state.g_params, state.d_params, real, rng,
        gp_grad_mode="revrev", **kw
    )
    (gg_rf, dg_rf), out_rf = losses.grads_simultaneous(
        gen, disc, state.g_params, state.d_params, real, rng,
        gp_grad_mode="revfwd", **kw
    )
    np.testing.assert_allclose(float(out_rf.gp_loss), float(out_rr.gp_loss), rtol=1e-6)
    np.testing.assert_allclose(float(out_rf.disc_loss), float(out_rr.disc_loss), rtol=1e-6)
    for k in gg_rr:
        np.testing.assert_allclose(np.asarray(gg_rf[k]), np.asarray(gg_rr[k]),
                                   rtol=1e-5, atol=1e-8, err_msg=k)
    for k in dg_rr:
        np.testing.assert_allclose(np.asarray(dg_rf[k]), np.asarray(dg_rr[k]),
                                   rtol=2e-4, atol=1e-7, err_msg=k)


def test_gp_revfwd_full_reduction_and_2nd_order_families():
    """revfwd under gp_full_reduction and through a full train step."""
    arch = get_architecture("pgan")
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 8, 8, 8))
    rng = jax.random.PRNGKey(5)
    results = {}
    for mode in ("revrev", "revfwd"):
        cfg = tiny_cfg(gp_grad_mode=mode, gp_full_reduction=True)
        state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
        step = jax.jit(make_train_step(arch, cfg, 2, g_opt, d_opt))
        results[mode] = step(state, real, rng, 0.5, 1e-3, 1e-3)
    st_rr, m_rr = results["revrev"]
    st_rf, m_rf = results["revfwd"]
    np.testing.assert_allclose(float(m_rf.gp_loss), float(m_rr.gp_loss), rtol=1e-5)
    for k in st_rr.d_params:
        np.testing.assert_allclose(
            np.asarray(st_rf.d_params[k]), np.asarray(st_rr.d_params[k]),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )


def test_static_alpha_zero_step_matches_traced():
    """make_train_step(static_alpha=0.0) prunes the transition branches; the
    resulting update must equal the traced step called with alpha=0.0 —
    including the transition-layer params, which keep receiving residual
    Adam-momentum updates from their zero gradients."""
    arch = get_architecture("pgan")
    cfg = tiny_cfg()
    state0, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 8, 8, 8))

    step_traced = jax.jit(make_train_step(arch, cfg, 2, g_opt, d_opt))
    step_static = jax.jit(make_train_step(arch, cfg, 2, g_opt, d_opt, static_alpha=0.0))

    st_t, st_s = state0, state0
    rng = jax.random.PRNGKey(5)
    for _ in range(3):  # several steps so Adam momentum on zero-grad params acts
        rng, k = jax.random.split(rng)
        st_t, m_t = step_traced(st_t, real, k, 0.0, 1e-3, 1e-3)
        st_s, m_s = step_static(st_s, real, k, 12345.0, 1e-3, 1e-3)  # traced alpha ignored
    np.testing.assert_allclose(float(m_s.gen_loss), float(m_t.gen_loss), rtol=1e-6)
    transition_keys = [k for k in st_t.g_params if "to_rgb_1" in k]
    assert transition_keys, "phase-2 pgan must have a to_rgb_1 transition layer"
    for k in st_t.g_params:
        np.testing.assert_allclose(np.asarray(st_s.g_params[k]), np.asarray(st_t.g_params[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    for k in st_t.d_params:
        np.testing.assert_allclose(np.asarray(st_s.d_params[k]), np.asarray(st_t.d_params[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_static_alpha_zero_all_families():
    """Every growing family's G/D must produce identical outputs with alpha
    statically 0 vs traced 0 at a transition phase."""
    for name in ("pgan", "pgan2", "pgandeep", "stylegan", "surfgan"):
        # (stylegan2 is single-phase: no alpha path)
        cfg = Config(
            architecture=name,
            start_shape="(1, 4, 4, 4)",
            final_shape="(1, 16, 16, 16)",
            latent_dim=16,
            base_batch_size=2,
            network_size="xxs",
            kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
            filter_spec=[[8, 8], [8, 8]],
            loss_fn="wgan",
        ).finalize()
        arch = get_architecture(name)
        params = arch.init(jax.random.PRNGKey(0), phase=2, cfg=cfg)
        z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
        rng = jax.random.PRNGKey(2)
        img_t = arch.generator(params, z, jnp.asarray(0.0), phase=2, cfg=cfg, rng=rng)
        img_s = arch.generator(params, z, 0.0, phase=2, cfg=cfg, rng=rng)
        np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_t), rtol=1e-6,
                                   atol=1e-7, err_msg=f"{name} generator")
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 8, 8, 8))
        s_t = arch.discriminator(params, x, jnp.asarray(0.0), phase=2, cfg=cfg)
        s_s = arch.discriminator(params, x, 0.0, phase=2, cfg=cfg)
        np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_t), rtol=1e-6,
                                   atol=1e-7, err_msg=f"{name} discriminator")


def test_clip_excludes_frozen_grads():
    """Freeze path clips over the non-frozen var list only (reference
    minimize_with_clipping(gen_vars_limited), optimization.py:150-152):
    frozen previous-phase grads must not inflate the global norm."""
    import jax.numpy as jnp

    from saragan_tpu.train.step import _clip_and_norms

    grads = {"old/w": jnp.full((4,), 100.0), "new/w": jnp.full((4,), 0.3)}
    clipped, max_norm, norms, _ = _clip_and_norms(
        grads, clipping=True, frozen=frozenset({"old/w"})
    )
    # ||new/w|| = 0.6 < 1 -> no clipping of the live grads at all
    np.testing.assert_allclose(np.asarray(clipped["new/w"]), 0.3, rtol=1e-6)
    # frozen grads untouched, excluded from telemetry
    np.testing.assert_allclose(np.asarray(clipped["old/w"]), 100.0)
    assert set(norms) == {"new/w"}
    assert abs(float(max_norm) - 0.6) < 1e-5


@pytest.mark.parametrize("variant", ["remat", "remat_offload"])
def test_remat_variants_match_plain_step(variant):
    """jax.checkpoint (plain recompute) and the offload policy (block
    activations parked in pinned host memory via the models' block_tap
    names) must both be numerically identical to the un-rematerialized
    step — remat/offload change WHERE activations live, never the math.
    Covers the WGAN-GP grad-of-grad through the checkpointed forwards."""
    arch = get_architecture("pgan")
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 8, 8, 8))
    rng = jax.random.PRNGKey(5)
    results = {}
    for on in (False, True):
        cfg = tiny_cfg(**({variant: on} if on else {}))
        state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
        step = jax.jit(make_train_step(arch, cfg, 2, g_opt, d_opt))
        results[on] = step(state, real, rng, 0.5, 1e-3, 1e-3)
    st_p, m_p = results[False]
    st_r, m_r = results[True]
    np.testing.assert_allclose(float(m_r.gen_loss), float(m_p.gen_loss), rtol=1e-6)
    np.testing.assert_allclose(float(m_r.disc_loss), float(m_p.disc_loss), rtol=1e-6)
    np.testing.assert_allclose(float(m_r.gp_loss), float(m_p.gp_loss), rtol=1e-6)
    for k in st_p.g_params:
        np.testing.assert_allclose(
            np.asarray(st_r.g_params[k]), np.asarray(st_p.g_params[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )
    for k in st_p.d_params:
        np.testing.assert_allclose(
            np.asarray(st_r.d_params[k]), np.asarray(st_p.d_params[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )
