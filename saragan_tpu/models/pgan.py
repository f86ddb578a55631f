"""pgan — the flagship progressive-growing GAN architecture.

Re-design of /root/reference/SURFGAN_3D/networks/pgan/{generator,discriminator}.py:
per-phase / per-layer kernel and filter counts are driven entirely by
``kernel_spec`` / ``filter_spec`` (NAS-searchable, reference
optuna_suggestions.py:235-276).

Generator (reference generator.py:74-103):
    dense -> reshape -> conv (+bias+act+pixelnorm)          [generator_in]
    per phase i in 2..phase: upscale, (conv+bias+act+pixelnorm) x2
    to_rgb of the final block, alpha-blended during mixing with the
    upscaled to_rgb of the previous resolution.

Discriminator (reference discriminator.py:71-108):
    from_rgb at the current resolution; per phase i in phase..2:
    (conv+bias+act) x2 then downscale; after the top block the downscaled
    input's from_rgb is alpha-blended in; head = conv + dense(latent_dim)
    + dense(1).

Parameter names match the reference's TF variable scopes exactly (e.g.
``generator/generator_in/dense/weight``) so phase-chained partial restore
(core.intersect_restore) reproduces reference utils.py:75-104.

Rank-generic: works for 2D (NCHW) and 3D (NCDHW) from the same code; the
spatial rank comes from ``cfg.base_shape``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from saragan_tpu import ops
from saragan_tpu.core import Params, Scope
from saragan_tpu.models.common import abstract_init_forward, block_tap, spectral_iters, static_alpha_zero
from saragan_tpu.models.registry import Architecture, register


def _get_spec(spec, phase_i, layer_i, what):
    if phase_i >= len(spec):
        raise ValueError(f"no {what} specified for phase {phase_i} (spec has {len(spec)})")
    if layer_i >= len(spec[phase_i]):
        raise ValueError(f"no {what} specified for layer {layer_i} in phase {phase_i}")
    return spec[phase_i][layer_i]


def get_filters(filter_spec, phase_i, layer_i):
    """reference generator.py:4-13."""
    return _get_spec(filter_spec, phase_i, layer_i, "filter count")


def get_kernels(kernel_spec, phase_i, layer_i):
    """reference generator.py:15-24."""
    return _get_spec(kernel_spec, phase_i, layer_i, "kernel shape")


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


def _bias_act_pn(scope, x, activation, param, fused: bool):
    """bias -> act -> pixel_norm; one fused Pallas pass when enabled
    (cfg.use_pallas_fusion) and the activation is leaky_relu."""
    if fused and activation == "leaky_relu":
        from saragan_tpu.core import zeros_initializer
        from saragan_tpu.ops.pallas_kernels import bias_act_pixelnorm

        b = scope.get("bias", (x.shape[1],), zeros_initializer())
        return bias_act_pixelnorm(x, b, alpha_lr=param, pixelnorm=True)
    x = ops.apply_bias(scope, x)
    x = ops.act(x, activation, param=param)
    return ops.pixel_norm(x)


def _generator_in(scope, x, shape, activation, kernel_spec, filter_spec, param, fused=False):
    """reference generator.py:26-45."""
    d = scope.sub("dense")
    f0 = get_filters(filter_spec, 0, 0)
    x = ops.dense(d, x, int(np.prod(shape)) * f0, activation, param=param)
    x = ops.apply_bias(d, x)
    x = ops.act(x, activation, param=param)
    x = x.reshape((-1, f0, *shape))
    c = scope.sub("conv")
    x = ops.conv(c, x, get_filters(filter_spec, 0, 1), get_kernels(kernel_spec, 0, 1), activation, param=param)
    x = _bias_act_pn(c, x, activation, param, fused)
    return x


def _generator_block(scope, x, activation, kernel_spec, filter_spec, i, param, fused=False,
                     fused_transitions=False, cfg=None):
    """reference generator.py:48-71."""
    if fused_transitions:
        # upscale + conv_1 as one transposed conv (exact algebraic fusion)
        c = scope.sub("conv_1")
        kernel = tuple(int(k) for k in get_kernels(kernel_spec, i - 1, 0))
        fmaps = get_filters(filter_spec, i - 1, 0)
        w = ops.get_weight(c, (*kernel, x.shape[1], fmaps), activation, param=param)
        x = ops.core.upscale_conv(x, w.astype(x.dtype))
        x = _bias_act_pn(c, x, activation, param, fused)
        x = block_tap(x, f"gen_block_{i}_mid", cfg)
        rest = (("conv_2", 1),)
    else:
        x = ops.upscale(x)
        rest = (("conv_1", 0), ("conv_2", 1))
    for name, li in rest:
        c = scope.sub(name)
        x = ops.conv(
            c,
            x,
            get_filters(filter_spec, i - 1, li),
            get_kernels(kernel_spec, i - 1, li),
            activation,
            param=param,
        )
        x = _bias_act_pn(c, x, activation, param, fused)
        if name == "conv_1":
            # mid-block offload tap: halves the per-block backward working
            # set under cfg.remat_offload (the phase-8 feasibility crux)
            x = block_tap(x, f"gen_block_{i}_mid", cfg)
    return x


def _generator(scope, z, alpha, phase, cfg, param):
    base_shape = cfg.base_shape
    kernel_spec = cfg.resolved_kernel_spec()
    filter_spec = cfg.resolved_filter_spec()
    activation = cfg.activation
    g = scope.sub("generator")

    fused = getattr(cfg, "use_pallas_fusion", False)
    x = _generator_in(
        g.sub("generator_in"), z, base_shape[1:], activation, kernel_spec, filter_spec, param,
        fused=fused,
    )
    x = block_tap(x, "gen_in", cfg)

    x_upsample = None
    for i in range(2, phase + 1):
        if i == phase and not static_alpha_zero(alpha):
            x_upsample = ops.upscale(
                ops.to_rgb(g.sub(f"to_rgb_{phase - 1}"), x, channels=base_shape[0])
            )
        x = _generator_block(
            g.sub(f"generator_block_{i}"), x, activation, kernel_spec, filter_spec, i, param,
            fused=fused, fused_transitions=getattr(cfg, "fused_transitions", False), cfg=cfg,
        )
        x = block_tap(x, f"gen_block_{i}", cfg)

    x_out = ops.to_rgb(g.sub(f"to_rgb_{phase}"), x, channels=base_shape[0])
    if x_upsample is not None:
        alpha = jnp.asarray(alpha, x_out.dtype)
        x_out = alpha * x_upsample + (1 - alpha) * x_out
    return x_out


def generator(
    params: Params,
    z: jax.Array,
    alpha,
    *,
    phase: int,
    cfg,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    conditioning=None,
) -> jax.Array:
    if conditioning is not None:
        raise NotImplementedError("pgan does not support conditioning (reference generator.py:76-77)")
    scope = Scope(params)
    return _generator(scope, z, alpha, phase, cfg, cfg.leakiness)


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------


def _discriminator_block(scope, x, activation, kernel_spec, filter_spec, i, param, cfg=None):
    """reference discriminator.py:25-45.

    Note the reference's index quirk, preserved here: conv_1 uses
    kernel_spec[i-1][1] with filter_spec[i-1][0]; conv_2 uses
    kernel_spec[i-1][0] with filter_spec[i-2][1].
    """
    c1 = scope.sub("conv_1")
    x = ops.conv(
        c1, x, get_filters(filter_spec, i - 1, 0), get_kernels(kernel_spec, i - 1, 1), activation, param=param
    )
    x = ops.apply_bias(c1, x)
    x = ops.act(x, activation, param=param)
    x = block_tap(x, f"disc_block_{i}_mid", cfg)
    c2 = scope.sub("conv_2")
    x = ops.conv(
        c2, x, get_filters(filter_spec, i - 2, 1), get_kernels(kernel_spec, i - 1, 0), activation, param=param
    )
    x = ops.apply_bias(c2, x)
    x = ops.act(x, activation, param=param)
    x = ops.downscale(x)
    return x


def _discriminator_out(scope, x, latent_dim, activation, kernel_spec, filter_spec, param):
    """reference discriminator.py:48-68."""
    o = scope.sub("discriminator_out")
    x = ops.conv(
        o, x, get_filters(filter_spec, 0, 0), get_kernels(kernel_spec, 0, 1), activation, param=param
    )
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
    kernel_spec = cfg.resolved_kernel_spec()
    filter_spec = cfg.resolved_filter_spec()
    activation = cfg.activation
    d = scope.sub("discriminator")

    x_downscale = x
    x = ops.from_rgb(
        d.sub(f"from_rgb_{phase}"), x, get_filters(filter_spec, phase - 1, 1), activation, param=param
    )
    x = block_tap(x, "disc_in", cfg)

    for i in reversed(range(2, phase + 1)):
        x = _discriminator_block(
            d.sub(f"discriminator_block_{i}"), x, activation, kernel_spec, filter_spec, i, param,
            cfg=cfg,
        )
        x = block_tap(x, f"disc_block_{i}", cfg)
        if i == phase and not static_alpha_zero(alpha):
            fromrgb_prev = ops.from_rgb(
                d.sub(f"from_rgb_{phase - 1}"),
                ops.downscale(x_downscale),
                get_filters(filter_spec, phase - 2, 1),
                activation,
                param=param,
            )
            a = jnp.asarray(alpha, x.dtype)
            x = a * fromrgb_prev + (1 - a) * x

    return _discriminator_out(d, x, cfg.latent_dim, activation, kernel_spec, filter_spec, param)


def discriminator(
    params: Params,
    x: jax.Array,
    alpha,
    *,
    phase: int,
    cfg,
    conditioning=None,
) -> jax.Array:
    if conditioning is not None:
        raise NotImplementedError(
            "pgan does not support conditioning (reference discriminator.py:73-74)"
        )
    scope = Scope(params, spectral=spectral_iters(cfg))
    return _discriminator(scope, x, alpha, phase, cfg, cfg.leakiness)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init(rng: jax.Array, *, phase: int, cfg) -> Params:
    """Create the full (G+D) parameter tree for `phase`.

    Runs both networks once on a batch-1 input in init mode; each parameter
    draws from an RNG key folded with a stable hash of its full name, so a
    layer gets the same initialization regardless of which phase it first
    appears in (mirrors the reference's per-phase graph rebuild + partial
    restore, optuna_objective.py:100 + utils.py:75-104).
    """
    params: Params = {}
    g_rng, d_rng = jax.random.split(rng)
    scope = Scope(params, init=True, rng=g_rng)
    z = jax.ShapeDtypeStruct((1, cfg.latent_dim), jnp.float32)
    abstract_init_forward(lambda zz: _generator(scope, zz, 1.0, phase, cfg, cfg.leakiness), z)
    scope = Scope(params, init=True, rng=d_rng, spectral=spectral_iters(cfg))
    x = jax.ShapeDtypeStruct(cfg.current_shape(phase, 1), jnp.float32)
    abstract_init_forward(lambda xx: _discriminator(scope, xx, 1.0, phase, cfg, cfg.leakiness), x)
    return params


register(Architecture("pgan", init, generator, discriminator))
