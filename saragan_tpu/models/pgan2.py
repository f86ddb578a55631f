"""pgan2 — PGGAN with residual blocks and skip-sum to_rgb chain.

Re-design of reference networks/pgan2/{generator,discriminator}.py:
residual 1x1-conv skips with gain normalization ``(x + t) / gain``
(generator.py:24-51), num_filters-table sizing instead of spec files,
progressive skip-sum to_rgb: every level's RGB is upscaled and summed, the
top level weighted (1 - alpha) during mixing (generator.py:78-84).
Adaptive kernels shrink to 1 on spatial dims < 3 (ops.py:25-29).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from saragan_tpu import ops
from saragan_tpu.core import Params, Scope
from saragan_tpu.models.common import abstract_init_forward, adaptive_kernel, phase_filters, resolve_base_dim, spectral_iters, static_alpha_zero
from saragan_tpu.models.registry import Architecture, register


def _generator_in(scope, x, filters, shape, activation, param):
    d = scope.sub("dense")
    import numpy as np

    x = ops.dense(d, x, int(np.prod(shape)) * filters, activation, param=param)
    x = ops.apply_bias(d, x)
    x = ops.act(x, activation, param=param)
    x = x.reshape((-1, filters, *shape))
    c = scope.sub("conv")
    kernel = adaptive_kernel(x.shape[2:])
    x = ops.conv(c, x, filters, kernel, activation, param=param)
    x = ops.apply_bias(c, x)
    x = ops.act(x, activation, param=param)
    x = ops.pixel_norm(x)
    return x


def _generator_block(scope, x, filters_out, activation, param, fused_transitions=False):
    r = scope.sub("residual")
    t = ops.conv(r, x, filters_out, (1,) * (x.ndim - 2), activation, param=param)
    t = ops.upscale(t)

    if fused_transitions:
        c = scope.sub("conv_1")
        kernel = adaptive_kernel([s * 2 for s in x.shape[2:]])
        w = ops.get_weight(c, (*kernel, x.shape[1], filters_out), activation, param=param)
        x = ops.core.upscale_conv(x, w.astype(x.dtype))
        x = ops.apply_bias(c, x)
        x = ops.act(x, activation, param=param)
        x = ops.pixel_norm(x)
        names = ("conv_2",)
    else:
        x = ops.upscale(x)
        names = ("conv_1", "conv_2")
    for name in names:
        c = scope.sub(name)
        kernel = adaptive_kernel(x.shape[2:])
        x = ops.conv(c, x, filters_out, kernel, activation, param=param)
        x = ops.apply_bias(c, x)
        x = ops.act(x, activation, param=param)
        x = ops.pixel_norm(x)

    gain = ops.calculate_gain(activation, param)
    return (x + t) * jnp.asarray(1.0 / gain, x.dtype)


def _generator(scope, z, alpha, phase, cfg, param):
    base_shape = cfg.base_shape
    channels = base_shape[0]
    base_dim = resolve_base_dim(cfg)
    activation = cfg.activation
    g = scope.sub("generator")

    x = _generator_in(g.sub("generator_in"), z, base_dim, base_shape[1:], activation, param)
    x_out = ops.to_rgb(g.sub("to_rgb_1"), x, channels)

    for i in range(2, phase + 1):
        filters_out = phase_filters(cfg, i)
        x = _generator_block(g.sub(f"generator_block_{i}"), x, filters_out, activation, param,
                             fused_transitions=getattr(cfg, "fused_transitions", False))
        rgb = ops.to_rgb(g.sub(f"to_rgb_{i}"), x, channels)
        if i == phase and not static_alpha_zero(alpha):
            a = jnp.asarray(alpha, x.dtype)
            x_out = (1 - a) * rgb + ops.upscale(x_out)
        else:
            # at static alpha==0 the i==phase branch reduces to exactly this
            x_out = rgb + ops.upscale(x_out)
    return x_out


def generator(params: Params, z, alpha, *, phase, cfg, rng=None, train=True, conditioning=None):
    if conditioning is not None:
        raise NotImplementedError()
    return _generator(Scope(params), z, alpha, phase, cfg, cfg.leakiness)


def _discriminator_block(scope, x, filters_in, filters_out, activation, param):
    r = scope.sub("residual")
    t = ops.downscale(x)
    t = ops.conv(r, t, filters_out, (1,) * (x.ndim - 2), activation, param=param)

    c1 = scope.sub("conv_1")
    kernel = adaptive_kernel(x.shape[2:])
    x = ops.conv(c1, x, filters_in, kernel, activation, param=param)
    x = ops.apply_bias(c1, x)
    x = ops.act(x, activation, param=param)
    c2 = scope.sub("conv_2")
    kernel = adaptive_kernel(x.shape[2:])
    x = ops.conv(c2, x, filters_out, kernel, activation, param=param)
    x = ops.apply_bias(c2, x)
    x = ops.act(x, activation, param=param)
    x = ops.downscale(x)
    gain = ops.calculate_gain(activation, param)
    return (x + t) * jnp.asarray(1.0 / gain, x.dtype)


def _discriminator_out(scope, x, latent_dim, filters_out, activation, param):
    o = scope.sub("discriminator_out")
    kernel = adaptive_kernel(x.shape[2:])
    x = ops.conv(o, x, filters_out, kernel, activation, param=param)
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
        x = _discriminator_block(
            d.sub(f"discriminator_block_{i}"), x, filters_in, filters_out, activation, param
        )
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
    if conditioning is not None:
        raise NotImplementedError()
    return _discriminator(Scope(params, spectral=spectral_iters(cfg)), x, alpha, phase, cfg, cfg.leakiness)


def init(rng: jax.Array, *, phase: int, cfg) -> Params:
    params: Params = {}
    g_rng, d_rng = jax.random.split(rng)
    z = jax.ShapeDtypeStruct((1, cfg.latent_dim), jnp.float32)
    x = jax.ShapeDtypeStruct(cfg.current_shape(phase, 1), jnp.float32)
    abstract_init_forward(lambda zz: _generator(Scope(params, init=True, rng=g_rng), zz, 1.0, phase, cfg, cfg.leakiness), z)
    abstract_init_forward(lambda xx: _discriminator(Scope(params, init=True, rng=d_rng, spectral=spectral_iters(cfg)), xx, 1.0, phase, cfg, cfg.leakiness), x)
    return params


register(Architecture("pgan2", init, generator, discriminator))
