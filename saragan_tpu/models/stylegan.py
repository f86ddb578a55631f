"""stylegan (3D) — StyleGAN v1 family member.

Re-design of reference networks/stylegan/: 8-layer z->w mapping (lrmul=0.01,
pixel-normed input, broadcast to 2*phase styles, g_mapping.py:4-31),
synthesis from a learned ones-constant with per-layer noise + bias + act +
instance_norm + AdaIN style_mod (g_synthesis.py), style-mixing
regularization with prob 0.9 (generator.py:37-48), w-avg tracking +
truncation (psi=0.7 — NB the reference applies truncation *unconditionally*
when psi is set, generator.py:51-56, including during training; preserved).
Discriminator = plain PGGAN-style blocks with num_filters sizing
(discriminator.py:4-69).

Functional deviations (documented): the w-average (`generator/d_z_avg`) is
not updated inside the forward pass (the reference mutates it via control
deps, generator.py:29-37); instead the registered `refresh_state` hook runs
once per train step (train/step.py) — same beta-0.995 tracking, applied
after the optimizer update, and `apply_truncation` stop-gradients the avg so
it is never gradient-trained.  Per-layer noise draws from the step RNG key;
when no key is passed the noise is omitted (eval determinism).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from saragan_tpu import ops
from saragan_tpu.core import Params, Scope, ones_initializer, zeros_initializer
from saragan_tpu.models.common import abstract_init_forward, adaptive_kernel, phase_filters, resolve_base_dim, spectral_iters, static_alpha_zero
from saragan_tpu.models.registry import Architecture, register
from saragan_tpu.models import style_ops

TRUNCATION_PSI = 0.7
TRUNCATION_LAYERS = 8
STYLE_MIXING_PROB = 0.9


def _synthesis_in(scope, d_z, base_dim, base_shape, activation, param, rng):
    c = scope.sub("constant_in")
    const = c.get("input_constant", (1, base_dim, *base_shape[1:]), ones_initializer())
    x = jnp.tile(const.astype(d_z.dtype), (d_z.shape[0],) + (1,) * (const.ndim - 1))
    x = style_ops.maybe_noise(c, x, rng, "noise")
    x = ops.apply_bias(c, x)
    x = ops.act(x, activation, param)
    x = ops.instance_norm(x)
    x = ops.style_mod(c, x, d_z[:, 0], activation, param)

    cv = scope.sub("conv")
    kernel = adaptive_kernel(x.shape[2:])
    x = ops.conv(cv, x, base_dim, kernel, activation, param)
    x = style_ops.maybe_noise(cv, x, rng, "noise")
    x = ops.apply_bias(cv, x)
    x = ops.act(x, activation, param)
    x = ops.instance_norm(x)
    x = ops.style_mod(cv, x, d_z[:, 1], activation, param)
    return x


def _synthesis_block(scope, x, filters_out, d_z, layer_idx, activation, param, rng,
                     fused_transitions=False):
    if fused_transitions:
        c = scope.sub("conv_1")
        kernel = adaptive_kernel([s * 2 for s in x.shape[2:]])
        w = ops.get_weight(c, (*kernel, x.shape[1], filters_out), activation, param=param)
        x = ops.core.upscale_conv(x, w.astype(x.dtype))
        x = style_ops.maybe_noise(c, x, rng, "noise")
        x = ops.apply_bias(c, x)
        x = ops.act(x, activation, param)
        x = ops.instance_norm(x)
        x = ops.style_mod(c, x, d_z[:, layer_idx * 2 - 2], activation, param)
        layers = (("conv_2", 1),)
    else:
        x = ops.upscale(x)
        layers = (("conv_1", 0), ("conv_2", 1))
    for name, j in layers:
        c = scope.sub(name)
        kernel = adaptive_kernel(x.shape[2:])
        x = ops.conv(c, x, filters_out, kernel, activation, param)
        x = style_ops.maybe_noise(c, x, rng, "noise")
        x = ops.apply_bias(c, x)
        x = ops.act(x, activation, param)
        x = ops.instance_norm(x)
        x = ops.style_mod(c, x, d_z[:, layer_idx * 2 - 2 + j], activation, param)
    return x


def _g_synthesis(scope, d_z, alpha, phase, cfg, param, rng):
    base_shape = cfg.base_shape
    base_dim = resolve_base_dim(cfg)
    activation = cfg.activation
    s = scope.sub("g_synthesis")

    x = _synthesis_in(s.sub("generator_in"), d_z, base_dim, base_shape, activation, param, rng)
    x_upsample = None
    for layer_idx in range(2, phase + 1):
        if layer_idx == phase and not static_alpha_zero(alpha):
            x_upsample = ops.upscale(
                ops.to_rgb(s.sub(f"to_rgb_{phase - 1}"), x, base_shape[0])
            )
        filters_out = phase_filters(cfg, layer_idx)
        x = _synthesis_block(
            s.sub(f"generator_block_{layer_idx}"), x, filters_out, d_z, layer_idx,
            activation, param, rng,
            fused_transitions=getattr(cfg, "fused_transitions", False),
        )
    x_out = ops.to_rgb(s.sub(f"to_rgb_{phase}"), x, base_shape[0])
    if x_upsample is not None:
        a = jnp.asarray(alpha, x_out.dtype)
        x_out = a * x_upsample + (1 - a) * x_out
    return x_out


def _generator(scope, z, alpha, phase, cfg, param, rng, train):
    g = scope.sub("generator")
    num_styles = phase * 2
    d_z_avg = g.get("d_z_avg", (z.shape[1],), zeros_initializer())
    d_z = style_ops.g_mapping(g, z, num_styles, act_param=param, activation=cfg.activation)

    if train and phase > 1 and rng is not None:
        k_mix, k_z, rng = jax.random.split(rng, 3)
        z_reg = jax.random.normal(k_z, z.shape, z.dtype)
        d_z_reg = style_ops.g_mapping(g, z_reg, num_styles, act_param=param, activation=cfg.activation)
        # v1 no-mix cutoff is `phase` (reference generator.py:47): styles
        # >= phase come from the second pass even without mixing
        d_z = style_ops.style_mixing(k_mix, d_z, d_z_reg, phase, num_styles,
                                     STYLE_MIXING_PROB, no_mix_cutoff=phase)

    # reference stylegan applies truncation unconditionally (generator.py:51)
    d_z = style_ops.apply_truncation(d_z, d_z_avg, num_styles, TRUNCATION_PSI, TRUNCATION_LAYERS)
    return _g_synthesis(g, d_z, alpha, phase, cfg, param, rng)


def generator(params: Params, z, alpha, *, phase, cfg, rng=None, train=True, conditioning=None):
    if conditioning is not None:
        raise NotImplementedError()
    return _generator(Scope(params), z, alpha, phase, cfg, cfg.leakiness, rng, train)


def _discriminator_block(scope, x, filters_in, filters_out, activation, param):
    c1 = scope.sub("conv_1")
    x = ops.conv(c1, x, filters_in, adaptive_kernel(x.shape[2:]), activation, param=param)
    x = ops.apply_bias(c1, x)
    x = ops.act(x, activation, param=param)
    c2 = scope.sub("conv_2")
    x = ops.conv(c2, x, filters_out, adaptive_kernel(x.shape[2:]), activation, param=param)
    x = ops.apply_bias(c2, x)
    x = ops.act(x, activation, param=param)
    return ops.downscale(x)


def _discriminator_out(scope, x, latent_dim, filters_out, activation, param):
    o = scope.sub("discriminator_out")
    x = ops.conv(o, x, filters_out, adaptive_kernel(x.shape[2:]), activation, param=param)
    x = ops.apply_bias(o, x)
    x = ops.act(x, activation, param=param)
    d1 = o.sub("dense_1")
    x = ops.dense(d1, x, latent_dim, activation, param=param)
    x = ops.apply_bias(d1, x)
    x = ops.act(x, activation, param=param)
    d2 = o.sub("dense_2")
    x = ops.dense(d2, x, 1, activation="linear")
    x = ops.apply_bias(d2, x)
    return x


def _discriminator(scope, x, alpha, phase, cfg, param):
    activation = cfg.activation
    d = scope.sub("discriminator")
    x_downscale = x
    filters_out = phase_filters(cfg, phase)
    x = ops.from_rgb(d.sub(f"from_rgb_{phase}"), x, filters_out, activation, param=param)
    for i in reversed(range(2, phase + 1)):
        filters_in = phase_filters(cfg, i)
        filters_out = phase_filters(cfg, i - 1)
        x = _discriminator_block(d.sub(f"discriminator_block_{i}"), x, filters_in, filters_out, activation, param)
        if i == phase and not static_alpha_zero(alpha):
            fromrgb_prev = ops.from_rgb(
                d.sub(f"from_rgb_{phase - 1}"), ops.downscale(x_downscale), filters_out,
                activation, param=param,
            )
            a = jnp.asarray(alpha, x.dtype)
            x = a * fromrgb_prev + (1 - a) * x
    if phase == 1:
        filters_out = phase_filters(cfg, 1)
    return _discriminator_out(d, x, cfg.latent_dim, filters_out, activation, param)


def discriminator(params: Params, x, alpha, *, phase, cfg, conditioning=None):
    return _discriminator(Scope(params, spectral=spectral_iters(cfg)), x, alpha, phase, cfg, cfg.leakiness)


def init(rng: jax.Array, *, phase: int, cfg) -> Params:
    params: Params = {}
    g_rng, d_rng, n_rng = jax.random.split(rng, 3)
    z = jax.ShapeDtypeStruct((1, cfg.latent_dim), jnp.float32)
    x = jax.ShapeDtypeStruct(cfg.current_shape(phase, 1), jnp.float32)
    abstract_init_forward(
        lambda zz, kk: _generator(Scope(params, init=True, rng=g_rng), zz, 1.0, phase, cfg,
                                  cfg.leakiness, kk, True),
        z, n_rng,
    )
    abstract_init_forward(lambda xx: _discriminator(Scope(params, init=True, rng=d_rng, spectral=spectral_iters(cfg)), xx, 1.0, phase, cfg, cfg.leakiness), x)
    return params


def refresh_state(g_params: Params, rng, *, phase, cfg):
    """Per-step w-average tracking (reference generator.py:29-37 updates the
    non-trainable d_z_avg with beta=0.995 inside the training forward)."""
    g = Scope(g_params).sub("generator")
    num_styles = phase * 2
    z = jax.random.normal(rng, (64, cfg.latent_dim))
    d_z = style_ops.g_mapping(g, z, num_styles, act_param=cfg.leakiness,
                              activation=cfg.activation)
    return style_ops.update_dlatent_avg(g_params, "generator", d_z[:, 0])


register(Architecture("stylegan", init, generator, discriminator,
                      refresh_state=refresh_state))
