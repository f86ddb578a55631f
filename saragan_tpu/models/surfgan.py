"""surfgan — the homegrown StyleGAN2 variant.

Re-design of reference networks/surfgan/: residual modulated generator
blocks with gain-normalized sums (g_synthesis.py:30-51), residual
discriminator blocks + minibatch-stddev head + optional projection
conditioning (discriminator.py:41-72), mapping with conditioning concat
(g_mapping.py), and its own op variants that thread the weight's
``runtime_coef`` through bias and noise (ops.py:14-45): biases are
*random-normal initialized* and scaled by the preceding layer's equalized-LR
coefficient, unlike the zero-init unit-scale biases everywhere else.

Style index conventions preserved exactly (g_synthesis.py): num_styles =
4*phase - 2; residual style = 4i-6, conv_1 = 3i-5, conv_2 = 3i-4, to_rgb =
4i-3 (to_rgb_1 uses style 1).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from saragan_tpu import ops
from saragan_tpu.core import Params, Scope, normal_initializer, zeros_initializer
from saragan_tpu.models.common import abstract_init_forward, adaptive_kernel, phase_filters, resolve_base_dim, spectral_iters, static_alpha_zero
from saragan_tpu.models.registry import Architecture, register
from saragan_tpu.models import style_ops

STYLE_MIXING_PROB = 0.9
TRUNCATION_LAYERS = 8


def _num_styles(phase: int) -> int:
    return phase * 4 - 2


def _runtime_coef(shape, activation, lrmul=1.0, param=None) -> float:
    fan_in = int(np.prod(shape[:-1]))
    gain = ops.calculate_gain(activation, param)
    return gain / math.sqrt(fan_in) * lrmul


def _apply_bias_rc(scope: Scope, x, runtime_coef: float):
    """Random-normal bias scaled by runtime_coef (surfgan/ops.py:39-45)."""
    b = scope.get("bias", (x.shape[1],), normal_initializer(1.0)) * runtime_coef
    b = b.astype(x.dtype)
    if x.ndim == 2:
        return x + b
    return x + b.reshape((1, -1) + (1,) * (x.ndim - 2))


def _apply_noise_rc(scope: Scope, x, rng, runtime_coef: float):
    """Noise with runtime_coef-scaled strength (surfgan/ops.py:31-36)."""
    strength = scope.get("noise_strength", (), zeros_initializer())
    if rng is None:
        return x
    noise_shape = (x.shape[0], 1) + x.shape[2:]
    noise = jax.random.normal(style_ops.layer_rng(rng, scope.prefix), noise_shape, x.dtype)
    return x + noise * (strength * runtime_coef).astype(x.dtype)


def _dense_rc(scope: Scope, x, fmaps, activation, lrmul=1.0, param=None):
    if x.ndim > 2:
        x = x.reshape((x.shape[0], -1))
    rc = _runtime_coef((x.shape[1], fmaps), activation, lrmul, param)
    return ops.dense(scope, x, fmaps, activation, lrmul=lrmul, param=param), rc


def _conv_rc(scope: Scope, x, fmaps, kernel, activation, param=None, lrmul=1.0):
    rc = _runtime_coef((*kernel, x.shape[1], fmaps), activation, lrmul, param)
    return ops.conv(scope, x, fmaps, kernel, activation, param=param, lrmul=lrmul), rc


def _modulated_conv_rc(scope, x, z, fmaps, kernel, activation, up=False, demodulate=True, param=None,
                       fused_transitions=False):
    """surfgan/ops.py:63-97: stylegan2 modulated conv, with surfgan's
    runtime-coef-threaded bias inside the 'modulate' dense."""
    spatial_rank = x.ndim - 2
    kernel = tuple(int(k) for k in kernel)
    w = ops.get_weight(scope, (*kernel, x.shape[1], fmaps), activation, param=param)
    rc = _runtime_coef((*kernel, x.shape[1], fmaps), activation, 1.0, param)

    mod = scope.sub("modulate")
    s, rc_dense = _dense_rc(mod, z, x.shape[1], activation, param=param)
    s = _apply_bias_rc(mod, s, rc_dense) + 1
    s = ops.act(s, activation, param)

    if demodulate:
        ww = w[None] * s.reshape((s.shape[0],) + (1,) * spatial_rank + (s.shape[1], 1))
        d = jax.lax.rsqrt(jnp.sum(jnp.square(ww), axis=tuple(range(1, spatial_rank + 2))) + 1e-8)

    x = x * s.reshape(s.shape + (1,) * spatial_rank).astype(x.dtype)
    if up:
        if fused_transitions:
            x = ops.core.upscale_conv(x, w.astype(x.dtype))
            if demodulate:
                x = x * d.reshape(d.shape + (1,) * spatial_rank).astype(x.dtype)
            return x, rc
        x = ops.upscale(x)
    x = ops.core.conv_apply(x, w.astype(x.dtype))
    if demodulate:
        x = x * d.reshape(d.shape + (1,) * spatial_rank).astype(x.dtype)
    return x, rc


def _to_rgb_mod(scope, x, z, channels=1):
    x, rc = _modulated_conv_rc(scope, x, z, channels, (1,) * (x.ndim - 2), "linear", demodulate=False)
    return _apply_bias_rc(scope, x, rc)


def _from_rgb(scope, x, filters_out, activation, param):
    x, rc = _conv_rc(scope, x, filters_out, (1,) * (x.ndim - 2), activation, param=param)
    x = _apply_bias_rc(scope, x, rc)
    return ops.act(x, activation, param=param)


# ---------------------------------------------------------------------------
# Mapping (surfgan/g_mapping.py)
# ---------------------------------------------------------------------------


def _g_mapping(scope, z, num_styles, activation, act_param, conditioning, mapping_layers=8,
               mapping_lrmul=0.01):
    m = scope.sub("g_mapping")
    mapping_fmaps = z.shape[1]
    if conditioning is not None:
        c = m.sub("conditioning")
        w = c.get("weight", (conditioning.shape[1], z.shape[1]), normal_initializer(1.0))
        y = jnp.matmul(conditioning.astype(z.dtype), w.astype(z.dtype))
        z = jnp.concatenate([z, y], axis=1)

    x = z * jax.lax.rsqrt(jnp.mean(jnp.square(z), axis=1, keepdims=True) + jnp.asarray(1e-8, z.dtype))
    latent_fmaps = z.shape[1]
    for layer_idx in range(mapping_layers):
        fmaps = latent_fmaps if layer_idx == mapping_layers - 1 else mapping_fmaps
        d = m.sub(f"dense_{layer_idx}")
        x, rc = _dense_rc(d, x, fmaps, activation, lrmul=mapping_lrmul, param=act_param)
        x = _apply_bias_rc(d, x, rc)
        x = ops.act(x, activation, param=act_param)
    return jnp.tile(x[:, None], (1, num_styles, 1))


# ---------------------------------------------------------------------------
# Synthesis (surfgan/g_synthesis.py)
# ---------------------------------------------------------------------------


def _synthesis_in(scope, d_z, base_dim, base_shape, activation, param, rng):
    c = scope.sub("constant_in")
    const = c.get("input_constant", (1, base_dim, *base_shape[1:]), normal_initializer(1.0))
    x = jnp.tile(const.astype(d_z.dtype), (d_z.shape[0],) + (1,) * (const.ndim - 1))

    cv = scope.sub("conv")
    x, rc = _modulated_conv_rc(cv, x, d_z[:, 0], base_dim, adaptive_kernel(x.shape[2:]), activation, param=param)
    x = _apply_noise_rc(cv.sub("apply_noise"), x, rng, rc)
    x = _apply_bias_rc(cv, x, rc)
    x = ops.act(x, activation, param)
    return x


def _synthesis_block(scope, x, filters_out, d_z, layer_idx, activation, param, rng,
                     fused_transitions=False):
    r = scope.sub("residual")
    t, _ = _modulated_conv_rc(
        r, x, d_z[:, layer_idx * 4 - 6], filters_out, (1,) * (x.ndim - 2),
        activation, up=True, param=param, fused_transitions=fused_transitions,
    )

    c1 = scope.sub("conv_1")
    # kernel fit to PRE-upscale dims (reference surfgan/g_synthesis.py:34-36)
    x, rc = _modulated_conv_rc(
        c1, x, d_z[:, layer_idx * 3 - 5], filters_out, adaptive_kernel(x.shape[2:]),
        activation, up=True, param=param, fused_transitions=fused_transitions,
    )
    x = _apply_noise_rc(c1.sub("apply_noise"), x, rng, rc)
    x = _apply_bias_rc(c1, x, rc)
    x = ops.act(x, activation, param)

    c2 = scope.sub("conv_2")
    x, rc = _modulated_conv_rc(
        c2, x, d_z[:, layer_idx * 3 - 4], filters_out, adaptive_kernel(x.shape[2:]),
        activation, param=param,
    )
    x = _apply_noise_rc(c2.sub("apply_noise"), x, rng, rc)
    x = _apply_bias_rc(c2, x, rc)
    x = ops.act(x, activation, param)

    gain = ops.calculate_gain(activation, param)
    return (x + t) * jnp.asarray(1.0 / gain, x.dtype)


def _g_synthesis(scope, d_z, alpha, phase, cfg, param, rng):
    base_shape = cfg.base_shape
    base_dim = resolve_base_dim(cfg)
    activation = cfg.activation
    s = scope.sub("g_synthesis")

    x = _synthesis_in(s.sub("generator_in"), d_z, base_dim, base_shape, activation, param, rng)
    x_out = _to_rgb_mod(s.sub("to_rgb_1"), x, d_z[:, 1], base_shape[0])
    for layer_idx in range(2, phase + 1):
        filters_out = phase_filters(cfg, layer_idx)
        x = _synthesis_block(
            s.sub(f"generator_block_{layer_idx}"), x, filters_out, d_z, layer_idx,
            activation, param, rng,
            fused_transitions=getattr(cfg, "fused_transitions", False),
        )
        rgb = _to_rgb_mod(s.sub(f"to_rgb_{layer_idx}"), x, d_z[:, layer_idx * 4 - 3], base_shape[0])
        if layer_idx == phase and not static_alpha_zero(alpha):
            a = jnp.asarray(alpha, x_out.dtype)
            x_out = (1 - a) * rgb + ops.upscale(x_out)
        else:
            # at static alpha==0 the layer_idx==phase branch reduces to this
            x_out = rgb + ops.upscale(x_out)
    return x_out


def _generator(scope, z, alpha, phase, cfg, param, rng, train, conditioning, truncation_psi=None):
    g = scope.sub("generator")
    num_styles = _num_styles(phase)
    d_z = _g_mapping(g, z, num_styles, cfg.activation, param, conditioning)
    d_z_avg = g.get("d_z_avg", (d_z.shape[-1],), zeros_initializer())

    if train and phase > 1 and rng is not None:
        k_mix, k_z, rng = jax.random.split(rng, 3)
        z_reg = jax.random.normal(k_z, z.shape, z.dtype)
        d_z_reg = _g_mapping(g, z_reg, num_styles, cfg.activation, param, conditioning)
        d_z = style_ops.style_mixing(k_mix, d_z, d_z_reg, phase, num_styles, STYLE_MIXING_PROB)
    if not train and truncation_psi is not None:
        d_z = style_ops.apply_truncation(d_z, d_z_avg, num_styles, truncation_psi, TRUNCATION_LAYERS)
    return _g_synthesis(g, d_z, alpha, phase, cfg, param, rng)


def generator(params: Params, z, alpha, *, phase, cfg, rng=None, train=True, conditioning=None,
              truncation_psi=None):
    return _generator(Scope(params), z, alpha, phase, cfg, cfg.leakiness, rng, train, conditioning, truncation_psi)


# ---------------------------------------------------------------------------
# Discriminator (surfgan/discriminator.py)
# ---------------------------------------------------------------------------


def _discriminator_block(scope, x, filters_in, filters_out, activation, param):
    r = scope.sub("residual")
    t = ops.downscale(x)
    t, _ = _conv_rc(r, t, filters_out, (1,) * (x.ndim - 2), activation, param=param)

    c1 = scope.sub("conv_1")
    x, rc = _conv_rc(c1, x, filters_in, adaptive_kernel(x.shape[2:]), activation, param=param)
    x = _apply_bias_rc(c1, x, rc)
    x = ops.act(x, activation, param=param)
    c2 = scope.sub("conv_2")
    x, rc = _conv_rc(c2, x, filters_out, adaptive_kernel(x.shape[2:]), activation, param=param)
    x = _apply_bias_rc(c2, x, rc)
    x = ops.act(x, activation, param=param)
    x = ops.downscale(x)
    gain = ops.calculate_gain(activation, param)
    return (x + t) * jnp.asarray(1.0 / gain, x.dtype)


def _discriminator_out(scope, x, latent_dim, filters_out, activation, param, conditioning):
    o = scope.sub("discriminator_out")
    x = ops.minibatch_stddev_layer(x)
    c = o.sub("conv1")
    x, rc = _conv_rc(c, x, filters_out, adaptive_kernel(x.shape[2:]), activation, param=param)
    x = _apply_bias_rc(c, x, rc)
    x = ops.act(x, activation, param=param)
    d1 = o.sub("dense1")
    x, rc = _dense_rc(d1, x, latent_dim, activation, param=param)
    x = _apply_bias_rc(d1, x, rc)
    x = ops.act(x, activation, param=param)
    d2 = o.sub("dense2")
    x, rc = _dense_rc(d2, x, 1, "linear")
    x = _apply_bias_rc(d2, x, rc)
    if conditioning is not None:
        x = jnp.sum(x * conditioning.astype(x.dtype), axis=1, keepdims=True)
    return x


def _discriminator(scope, x, alpha, phase, cfg, param, conditioning):
    activation = cfg.activation
    d = scope.sub("discriminator")
    x_downscale = x
    filters_out = phase_filters(cfg, phase)
    x = _from_rgb(d.sub(f"from_rgb_{phase}"), x, filters_out, activation, param)
    for i in reversed(range(2, phase + 1)):
        filters_in = phase_filters(cfg, i)
        filters_out = phase_filters(cfg, i - 1)
        x = _discriminator_block(d.sub(f"discriminator_block_{i}"), x, filters_in, filters_out, activation, param)
        if i == phase and not static_alpha_zero(alpha):
            fromrgb_prev = _from_rgb(
                d.sub(f"from_rgb_{phase - 1}"), ops.downscale(x_downscale), filters_out, activation, param
            )
            a = jnp.asarray(alpha, x.dtype)
            x = a * fromrgb_prev + (1 - a) * x
    if phase == 1:
        filters_out = phase_filters(cfg, 1)
    return _discriminator_out(d, x, cfg.latent_dim, filters_out, activation, param, conditioning)


def discriminator(params: Params, x, alpha, *, phase, cfg, conditioning=None):
    return _discriminator(Scope(params, spectral=spectral_iters(cfg)), x, alpha, phase, cfg, cfg.leakiness, conditioning)


def init(rng: jax.Array, *, phase: int, cfg) -> Params:
    params: Params = {}
    g_rng, d_rng, n_rng = jax.random.split(rng, 3)
    cond = None
    if cfg.num_labels:
        cond = jnp.zeros((1, cfg.num_labels))
    z = jax.ShapeDtypeStruct((1, cfg.latent_dim), jnp.float32)
    x = jax.ShapeDtypeStruct(cfg.current_shape(phase, 1), jnp.float32)
    abstract_init_forward(lambda zz, kk: _generator(Scope(params, init=True, rng=g_rng), zz, 1.0, phase, cfg, cfg.leakiness, kk, True, cond), z, n_rng)
    # minibatch-stddev needs batch >= 1; group clamps to batch size
    abstract_init_forward(lambda xx: _discriminator(Scope(params, init=True, rng=d_rng, spectral=spectral_iters(cfg)), xx, 1.0, phase, cfg, cfg.leakiness, cond), x)
    return params


def refresh_state(g_params: Params, rng, *, phase, cfg):
    """Per-step w-average tracking (reference surfgan/generator.py:28-37;
    unconditional draw — the avg tracks the marginal w distribution)."""
    g = Scope(g_params).sub("generator")
    num_styles = _num_styles(phase)
    z = jax.random.normal(rng, (64, cfg.latent_dim))
    d_z = _g_mapping(g, z, num_styles, cfg.activation, cfg.leakiness, None)
    return style_ops.update_dlatent_avg(g_params, "generator", d_z[:, 0])


register(Architecture("surfgan", init, generator, discriminator,
                      refresh_state=refresh_state))
