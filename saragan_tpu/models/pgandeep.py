"""pgandeep — pgan generalized to arbitrary per-phase layer counts.

Re-design of reference networks/pgandeep/{generator,discriminator}.py: each
phase's layer count is ``len(kernel_spec[phase])`` (generator.py:37-44,
61-70).  Index conventions preserved:

* generator_in: conv layers 1..L-1 use spec[0][layer];
* generator blocks: layer j (1-based) uses spec[i-1][j-1];
* discriminator blocks: every conv uses kernel_spec[i-1][1]; the last layer
  takes filter_spec[i-2][L-1], earlier layers filter_spec[i-1][L-j-1]
  (discriminator.py:28-39);
* discriminator head: conv layers walk spec[0] backwards
  (discriminator.py:66-73).

Deviation (documented): the reference's pgandeep discriminator *forgets to
call* discriminator_out (discriminator.py:95-131 returns the feature map),
which cannot train; we call the head, matching the other architectures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from saragan_tpu import ops
from saragan_tpu.core import Params, Scope
from saragan_tpu.models.pgan import get_filters, get_kernels
from saragan_tpu.models.common import abstract_init_forward, spectral_iters, static_alpha_zero
from saragan_tpu.models.registry import Architecture, register


def _generator_in(scope, x, shape, activation, kernel_spec, filter_spec, param):
    d = scope.sub("dense")
    f0 = get_filters(filter_spec, 0, 0)
    x = ops.dense(d, x, int(np.prod(shape)) * f0, activation, param=param)
    x = ops.apply_bias(d, x)
    x = ops.act(x, activation, param=param)
    x = x.reshape((-1, f0, *shape))
    num_layers = len(kernel_spec[0])
    for layer_i in range(1, num_layers):
        c = scope.sub(f"conv_{layer_i}")
        x = ops.conv(
            c, x, get_filters(filter_spec, 0, layer_i), get_kernels(kernel_spec, 0, layer_i),
            activation, param=param,
        )
        x = ops.apply_bias(c, x)
        x = ops.act(x, activation, param=param)
        x = ops.pixel_norm(x)
    return x


def _generator_block(scope, x, activation, kernel_spec, filter_spec, i, param):
    x = ops.upscale(x)
    num_layers = len(kernel_spec[i - 1])
    for layer_i in range(1, num_layers + 1):
        c = scope.sub(f"conv_{layer_i}")
        x = ops.conv(
            c, x,
            get_filters(filter_spec, i - 1, layer_i - 1),
            get_kernels(kernel_spec, i - 1, layer_i - 1),
            activation, param=param,
        )
        x = ops.apply_bias(c, x)
        x = ops.act(x, activation, param=param)
        x = ops.pixel_norm(x)
    return x


def _generator(scope, z, alpha, phase, cfg, param):
    base_shape = cfg.base_shape
    kernel_spec = cfg.resolved_kernel_spec()
    filter_spec = cfg.resolved_filter_spec()
    activation = cfg.activation
    g = scope.sub("generator")

    x = _generator_in(g.sub("generator_in"), z, base_shape[1:], activation, kernel_spec, filter_spec, param)
    x_upsample = None
    for i in range(2, phase + 1):
        if i == phase and not static_alpha_zero(alpha):
            x_upsample = ops.upscale(ops.to_rgb(g.sub(f"to_rgb_{phase - 1}"), x, base_shape[0]))
        x = _generator_block(g.sub(f"generator_block_{i}"), x, activation, kernel_spec, filter_spec, i, param)
    x_out = ops.to_rgb(g.sub(f"to_rgb_{phase}"), x, base_shape[0])
    if x_upsample is not None:
        a = jnp.asarray(alpha, x_out.dtype)
        x_out = a * x_upsample + (1 - a) * x_out
    return x_out


def generator(params: Params, z, alpha, *, phase, cfg, rng=None, train=True, conditioning=None):
    if conditioning is not None:
        raise NotImplementedError()
    return _generator(Scope(params), z, alpha, phase, cfg, cfg.leakiness)


def _discriminator_block(scope, x, activation, kernel_spec, filter_spec, i, param):
    num_layers = len(kernel_spec[i - 1])
    for layer_i in range(1, num_layers + 1):
        c = scope.sub(f"conv_{layer_i}")
        kernel = get_kernels(kernel_spec, i - 1, 1)
        if layer_i == num_layers:
            filters = get_filters(filter_spec, i - 2, num_layers - 1)
        else:
            filters = get_filters(filter_spec, i - 1, num_layers - layer_i - 1)
        x = ops.conv(c, x, filters, kernel, activation, param=param)
        x = ops.apply_bias(c, x)
        x = ops.act(x, activation, param=param)
    return ops.downscale(x)


def _discriminator_out(scope, x, latent_dim, activation, kernel_spec, filter_spec, param):
    o = scope.sub("discriminator_out")
    num_layers = len(kernel_spec[0])
    for layer_i in range(1, num_layers):
        c = o.sub(f"conv_{layer_i}")
        kernel = get_kernels(kernel_spec, 0, num_layers - layer_i)
        filters = get_filters(filter_spec, 0, num_layers - layer_i - 1)
        x = ops.conv(c, x, filters, kernel, activation, param=param)
        x = ops.apply_bias(c, x)
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
    kernel_spec = cfg.resolved_kernel_spec()
    filter_spec = cfg.resolved_filter_spec()
    activation = cfg.activation
    d = scope.sub("discriminator")
    x_downscale = x

    x = ops.from_rgb(
        d.sub(f"from_rgb_{phase}"), x, get_filters(filter_spec, phase - 1, 1), activation, param=param
    )
    for i in reversed(range(2, phase + 1)):
        x = _discriminator_block(d.sub(f"discriminator_block_{i}"), x, activation, kernel_spec, filter_spec, i, param)
        if i == phase and not static_alpha_zero(alpha):
            fromrgb_prev = ops.from_rgb(
                d.sub(f"from_rgb_{phase - 1}"), ops.downscale(x_downscale),
                get_filters(filter_spec, phase - 2, 1), activation, param=param,
            )
            a = jnp.asarray(alpha, x.dtype)
            x = a * fromrgb_prev + (1 - a) * x

    return _discriminator_out(d, x, cfg.latent_dim, activation, kernel_spec, filter_spec, param)


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


register(Architecture("pgandeep", init, generator, discriminator))
