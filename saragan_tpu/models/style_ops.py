"""Style-family building blocks: mapping network, modulated conv, style
mixing, truncation.

Sources: reference networks/stylegan/g_mapping.py:4-31,
networks/stylegan2/ops.py:5-43, networks/surfgan/ops.py, and the
generator-level mixing/truncation logic in networks/{stylegan,stylegan2,
surfgan}/generator.py.

Note the reference's modulated conv "modulates activations, not weights, at
conv time" (SURVEY C9): the modulated weight tensor `ww` exists only to
compute the demodulation coefficient; the actual conv runs on `x * s` with
the plain weight, then scales by `d` — mathematically identical to weight
modulation for a per-sample scale, but avoids grouped convs.  We keep that
formulation: it is also the TPU-friendly one (one big batched conv on the
MXU instead of per-sample weight tensors).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from saragan_tpu import ops
from saragan_tpu.core import Scope, _stable_hash, normal_initializer


def layer_rng(rng: Optional[jax.Array], name: str) -> Optional[jax.Array]:
    """Deterministic per-layer key derived from the step key."""
    if rng is None:
        return None
    return jax.random.fold_in(rng, _stable_hash(name))


def maybe_noise(scope: Scope, x, rng: Optional[jax.Array], name: str):
    """apply_noise when a key is available; identity (strength*0 noise would
    still be identity at init) otherwise — eval paths may omit rng."""
    if rng is None:
        # still touch the parameter so init/restore see it
        scope.get("noise_strength", (), lambda k, s, d: jnp.zeros(s, d))
        return x
    return ops.apply_noise(scope, x, layer_rng(rng, scope.prefix + "/" + name))


def g_mapping(
    scope: Scope,
    z: jax.Array,
    num_styles: int,
    *,
    mapping_layers: int = 8,
    mapping_fmaps: Optional[int] = None,
    mapping_lrmul: float = 0.01,
    activation: str = "leaky_relu",
    act_param: float = 0.2,
    last_layer_latent: bool = False,
    bias_lrmul: Optional[float] = None,
):
    """z -> broadcast dlatents (N, num_styles, latent).

    stylegan (g_mapping.py:4-31): all layers sized latent_fmaps, bias lrmul 1.
    stylegan2: fmaps = mapping_fmaps except last = latent; bias lrmul =
    mapping_lrmul.  (surfgan's conditioning-concat mapping lives in
    models/surfgan._g_mapping — its hidden-layer sizing differs, so it is
    not folded in here.)
    """
    m = scope.sub("g_mapping")
    x = z * jax.lax.rsqrt(jnp.mean(jnp.square(z), axis=1, keepdims=True) + jnp.asarray(1e-8, z.dtype))
    latent_fmaps = z.shape[1]
    for layer_idx in range(mapping_layers):
        if last_layer_latent and mapping_fmaps is not None:
            fmaps = latent_fmaps if layer_idx == mapping_layers - 1 else mapping_fmaps
        else:
            fmaps = latent_fmaps
        d = m.sub(f"dense_{layer_idx}")
        x = ops.dense(d, x, fmaps, activation, lrmul=mapping_lrmul, param=act_param)
        x = ops.apply_bias(d, x, lrmul=bias_lrmul if bias_lrmul is not None else 1.0)
        x = ops.act(x, activation, param=act_param)
    return jnp.tile(x[:, None], (1, num_styles, 1))


def modulated_conv(
    scope: Scope,
    x: jax.Array,
    z: jax.Array,
    fmaps: int,
    kernel,
    activation: str,
    up: bool = False,
    demodulate: bool = True,
    param=None,
    lrmul: float = 1.0,
    fused_transitions: bool = False,
):
    """Modulated conv (reference stylegan2/ops.py:5-37), rank-generic."""
    spatial_rank = x.ndim - 2
    kernel = tuple(int(k) for k in kernel)
    w = ops.get_weight(scope, (*kernel, x.shape[1], fmaps), activation, param=param, lrmul=lrmul)

    mod = scope.sub("modulate")
    s = ops.dense(mod, z, fmaps=x.shape[1], activation=activation, param=param)
    s = ops.apply_bias(mod, s) + 1
    s = ops.act(s, activation, param)

    if demodulate:
        # ww = w[None] * s[:, None..., :, None]; d = rsqrt(sum ww^2 over k+in)
        ww = w[None] * s.reshape((s.shape[0],) + (1,) * spatial_rank + (s.shape[1], 1))
        d = jax.lax.rsqrt(
            jnp.sum(jnp.square(ww), axis=tuple(range(1, spatial_rank + 2))) + 1e-8
        )  # (N, fmaps)

    x = x * s.reshape(s.shape + (1,) * spatial_rank).astype(x.dtype)
    if up:
        if fused_transitions:
            # upscale commutes with the per-channel modulation already
            # applied; fuse the upscale into the conv (exact)
            x = ops.core.upscale_conv(x, w.astype(x.dtype))
            if demodulate:
                x = x * d.reshape(d.shape + (1,) * spatial_rank).astype(x.dtype)
            return x
        x = ops.upscale(x)

    x = ops.core.conv_apply(x, w.astype(x.dtype))
    if demodulate:
        x = x * d.reshape(d.shape + (1,) * spatial_rank).astype(x.dtype)
    return x


def to_rgb_mod(scope: Scope, x, z, channels: int = 1):
    """Modulated 1x1 to_rgb without demodulation (stylegan2/ops.py:40-43)."""
    kernel = (1,) * (x.ndim - 2)
    x = modulated_conv(scope, x, z, channels, kernel, activation="linear", demodulate=False)
    return ops.apply_bias(scope, x)


def style_mixing(
    rng: jax.Array,
    d_z: jax.Array,
    d_z_reg: jax.Array,
    phase: int,
    num_styles: int,
    style_mixing_prob: float,
    no_mix_cutoff: int = None,
):
    """Replace styles past a random cutoff with a second mapping pass
    (reference stylegan/generator.py:37-48).

    `no_mix_cutoff` is the cutoff on non-mixing steps: stylegan-v1 uses
    `phase` there (generator.py:47 — styles >= phase always come from the
    second pass), while stylegan2/surfgan use all `num_styles`
    (stylegan2/generator.py:49).  Defaults to num_styles."""
    if no_mix_cutoff is None:
        no_mix_cutoff = num_styles
    k1, k2 = jax.random.split(rng)
    use_mix = jax.random.uniform(k1, ()) < style_mixing_prob
    cutoff = jnp.where(
        use_mix,
        jax.random.randint(k2, (), 1, max(phase, 2)),
        jnp.asarray(no_mix_cutoff, jnp.int32),
    )
    layer_idx = jnp.arange(num_styles)[None, :, None]
    return jnp.where(layer_idx < cutoff, d_z, d_z_reg)


def apply_truncation(d_z: jax.Array, d_z_avg: jax.Array, num_styles: int,
                     truncation_psi: float, truncation_layers: int):
    """Truncation trick (reference stylegan/generator.py:51-56).  d_z_avg is
    non-trainable in the reference; the stop_gradient keeps the optimizer
    from training it through this blend (it is updated only by the
    refresh_state w-average tracking)."""
    d_z_avg = jax.lax.stop_gradient(d_z_avg)
    layer_idx = jnp.arange(num_styles)[None, :, None]
    coefs = jnp.where(layer_idx < truncation_layers, truncation_psi, 1.0).astype(d_z.dtype)
    return coefs * d_z + (1 - coefs) * d_z_avg.astype(d_z.dtype)


def update_dlatent_avg(params, prefix: str, d_z_first: jax.Array, beta: float = 0.995):
    """w-avg tracking helper (reference generator.py:29-37 updates d_z_avg via
    control deps inside the forward; functionally the trainer calls this with
    the batch's first-style dlatents and writes the result back)."""
    key = f"{prefix}/d_z_avg"
    avg = params[key]
    batch_avg = jnp.mean(d_z_first, axis=0)
    return {**params, key: beta * avg + (1 - beta) * batch_avg}
