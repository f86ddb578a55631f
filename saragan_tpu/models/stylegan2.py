"""stylegan2 (3D).

Re-design of reference networks/stylegan2/: modulated conv (activations
scaled by the style, demodulated after — ops.py:5-37), skip-sum to_rgb chain
with 3*phase-2 styles (g_synthesis.py:45-72), residual discriminator with
gain-normalized sums and no alpha path (no progressive growth: the reference
asserts starting_phase == ending_phase, main.py:413-414 — enforced by
Config.finalize).  Mapping: fmaps=512 hidden with latent-sized last layer
and mapping-lrmul bias (g_mapping.py).  Truncation only at eval
(generator.py:54, psi default None).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from saragan_tpu import ops
from saragan_tpu.core import Params, Scope, normal_initializer, zeros_initializer
from saragan_tpu.models.common import abstract_init_forward, adaptive_kernel, phase_filters, resolve_base_dim, spectral_iters
from saragan_tpu.models.registry import Architecture, register
from saragan_tpu.models import style_ops

STYLE_MIXING_PROB = 0.9
TRUNCATION_LAYERS = 8


def _num_styles(phase: int) -> int:
    return phase * 3 - 2


def _synthesis_in(scope, d_z, base_dim, base_shape, activation, param, rng):
    c = scope.sub("constant_in")
    const = c.get("input_constant", (1, base_dim, *base_shape[1:]), normal_initializer(1.0))
    x = jnp.tile(const.astype(d_z.dtype), (d_z.shape[0],) + (1,) * (const.ndim - 1))

    cv = scope.sub("conv")
    kernel = adaptive_kernel(x.shape[2:])
    x = style_ops.modulated_conv(cv, x, d_z[:, 0], base_dim, kernel, activation, param=param)
    x = style_ops.maybe_noise(cv, x, rng, "noise")
    x = ops.apply_bias(cv, x)
    x = ops.act(x, activation, param)
    return x


def _synthesis_block(scope, x, filters_out, d_z, layer_idx, activation, param, rng,
                     fused_transitions=False):
    c1 = scope.sub("conv_1")
    # NB kernel fit to the PRE-upscale dims (reference g_synthesis.py:28-30
    # reads x's shape before modulated_conv3d(up=True))
    x = style_ops.modulated_conv(
        c1, x, d_z[:, layer_idx * 3 - 5], filters_out, adaptive_kernel(x.shape[2:]),
        activation, up=True, param=param, fused_transitions=fused_transitions,
    )
    x = style_ops.maybe_noise(c1, x, rng, "noise")
    x = ops.apply_bias(c1, x)
    x = ops.act(x, activation, param)

    c2 = scope.sub("conv_2")
    x = style_ops.modulated_conv(
        c2, x, d_z[:, layer_idx * 3 - 4], filters_out, adaptive_kernel(x.shape[2:]),
        activation, param=param,
    )
    x = style_ops.maybe_noise(c2, x, rng, "noise")
    x = ops.apply_bias(c2, x)
    x = ops.act(x, activation, param)
    return x


def _g_synthesis(scope, d_z, alpha, phase, cfg, param, rng):
    base_shape = cfg.base_shape
    base_dim = resolve_base_dim(cfg)
    activation = cfg.activation
    s = scope.sub("g_synthesis")

    x = _synthesis_in(s.sub("generator_in"), d_z, base_dim, base_shape, activation, param, rng)
    x_out = style_ops.to_rgb_mod(s.sub("to_rgb_1"), x, d_z[:, 0], base_shape[0])
    for layer_idx in range(2, phase + 1):
        filters_out = phase_filters(cfg, layer_idx)
        x = _synthesis_block(
            s.sub(f"generator_block_{layer_idx}"), x, filters_out, d_z, layer_idx,
            activation, param, rng,
            fused_transitions=getattr(cfg, "fused_transitions", False),
        )
        rgb = style_ops.to_rgb_mod(
            s.sub(f"to_rgb_{layer_idx}"), x, d_z[:, layer_idx * 3 - 3], base_shape[0]
        )
        x_out = rgb + ops.upscale(x_out)
    return x_out


def _generator(scope, z, alpha, phase, cfg, param, rng, train, truncation_psi=None):
    g = scope.sub("generator")
    num_styles = _num_styles(phase)
    d_z_avg = g.get("d_z_avg", (z.shape[1],), zeros_initializer())
    d_z = style_ops.g_mapping(
        g, z, num_styles, activation=cfg.activation, act_param=param,
        mapping_fmaps=512, last_layer_latent=True, bias_lrmul=0.01,
    )
    if train and rng is not None:
        k_mix, k_z, rng = jax.random.split(rng, 3)
        z_reg = jax.random.normal(k_z, z.shape, z.dtype)
        d_z_reg = style_ops.g_mapping(
            g, z_reg, num_styles, activation=cfg.activation, act_param=param,
            mapping_fmaps=512, last_layer_latent=True, bias_lrmul=0.01,
        )
        d_z = style_ops.style_mixing(k_mix, d_z, d_z_reg, phase, num_styles, STYLE_MIXING_PROB)
    if not train and truncation_psi is not None:
        d_z = style_ops.apply_truncation(d_z, d_z_avg, num_styles, truncation_psi, TRUNCATION_LAYERS)
    return _g_synthesis(g, d_z, alpha, phase, cfg, param, rng)


def generator(params: Params, z, alpha, *, phase, cfg, rng=None, train=True, conditioning=None,
              truncation_psi=None):
    if conditioning is not None:
        raise NotImplementedError()
    return _generator(Scope(params), z, alpha, phase, cfg, cfg.leakiness, rng, train, truncation_psi)


def _discriminator_block(scope, x, filters_in, filters_out, activation, param):
    r = scope.sub("residual")
    t = ops.conv(r, x, filters_out, (1,) * (x.ndim - 2), activation, param=param)
    t = ops.downscale(t)

    c1 = scope.sub("conv_1")
    x = ops.conv(c1, x, filters_in, adaptive_kernel(x.shape[2:]), activation, param=param)
    x = ops.apply_bias(c1, x)
    x = ops.act(x, activation, param=param)
    c2 = scope.sub("conv_2")
    x = ops.conv(c2, x, filters_out, adaptive_kernel(x.shape[2:]), activation, param=param)
    x = ops.apply_bias(c2, x)
    x = ops.act(x, activation, param=param)
    x = ops.downscale(x)
    gain = ops.calculate_gain(activation, param)
    return (x + t) * jnp.asarray(1.0 / gain, x.dtype)


def _discriminator_out(scope, x, latent_dim, filters_out, activation, param):
    o = scope.sub("discriminator_out")
    c = o.sub("conv")
    x = ops.conv(c, x, filters_out, adaptive_kernel(x.shape[2:]), activation, param=param)
    x = ops.apply_bias(c, x)
    x = ops.act(x, activation, param=param)
    d1 = o.sub("dense_1")
    x = ops.dense(d1, x, latent_dim, activation, param=param)
    x = ops.apply_bias(d1, x)
    x = ops.act(x, activation, param=param)
    d = o.sub("dense")
    x = ops.dense(d, x, 1, activation="linear")
    x = ops.apply_bias(d, x)
    return x


def _discriminator(scope, x, alpha, phase, cfg, param):
    activation = cfg.activation
    d = scope.sub("discriminator")
    filters_out = phase_filters(cfg, phase)
    x = ops.from_rgb(d.sub(f"from_rgb_{phase}"), x, filters_out, activation, param=param)
    for i in reversed(range(2, phase + 1)):
        filters_in = phase_filters(cfg, i)
        filters_out = phase_filters(cfg, i - 1)
        x = _discriminator_block(d.sub(f"discriminator_block_{i}"), x, filters_in, filters_out, activation, param)
    if phase == 1:
        filters_out = phase_filters(cfg, 1)
    return _discriminator_out(d, x, cfg.latent_dim, filters_out, activation, param)


def discriminator(params: Params, x, alpha, *, phase, cfg, conditioning=None):
    if conditioning is not None:
        raise NotImplementedError()
    return _discriminator(Scope(params, spectral=spectral_iters(cfg)), x, alpha, phase, cfg, cfg.leakiness)


def init(rng: jax.Array, *, phase: int, cfg) -> Params:
    params: Params = {}
    g_rng, d_rng, n_rng = jax.random.split(rng, 3)
    z = jax.ShapeDtypeStruct((1, cfg.latent_dim), jnp.float32)
    x = jax.ShapeDtypeStruct(cfg.current_shape(phase, 1), jnp.float32)
    abstract_init_forward(lambda zz, kk: _generator(Scope(params, init=True, rng=g_rng), zz, 1.0, phase, cfg, cfg.leakiness, kk, True), z, n_rng)
    abstract_init_forward(lambda xx: _discriminator(Scope(params, init=True, rng=d_rng, spectral=spectral_iters(cfg)), xx, 1.0, phase, cfg, cfg.leakiness), x)
    return params


def refresh_state(g_params: Params, rng, *, phase, cfg):
    """Per-step w-average tracking (reference stylegan2/generator.py:29-37)."""
    g = Scope(g_params).sub("generator")
    num_styles = _num_styles(phase)
    z = jax.random.normal(rng, (64, cfg.latent_dim))
    d_z = style_ops.g_mapping(
        g, z, num_styles, activation=cfg.activation, act_param=cfg.leakiness,
        mapping_fmaps=512, last_layer_latent=True, bias_lrmul=0.01,
    )
    return style_ops.update_dlatent_avg(g_params, "generator", d_z[:, 0])


register(Architecture("stylegan2", init, generator, discriminator,
                      refresh_state=refresh_state))
