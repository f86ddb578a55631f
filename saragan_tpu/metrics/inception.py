"""FID Inception network (pool3, 2048-d) in JAX.

The reference computes FID with Google's frozen "classify_image" Inception
(fid_new.py:291-317).  The de-facto standard weights today are pytorch-fid's
`pt_inception-2015-12-05` state dict — this module implements that exact
architecture (torchvision InceptionV3 with the FID variants' pooling quirks:
average pools with count_include_pad=False, and a max pool in Mixed_7c's
pool branch) so those weights drop in:

    params = convert_torch_state_dict("pt_inception-2015-12-05-6726825d.pth")
    save_inception_npz(params, "inception_fid.npz")         # once, offline
    extractor = InceptionFeatures("inception_fid.npz")       # bit-matched FID

Without a weights file the framework falls back to the hermetic
RandomConvFeatures (fid.py).  Parameters are keyed by the torch state-dict
names, so conversion is mechanical; BatchNorm runs in inference mode
(eps=1e-3).  Input: (N, H, W, 3) in [0, 255]; resized to 299 bilinear
(antialias off, matching F.interpolate align_corners=False) and scaled to
[-1, 1].
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, np.ndarray]

BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# primitives (NCHW, OIHW weights — torch layout)
# ---------------------------------------------------------------------------


def _conv(x, w, stride=(1, 1), padding=((0, 0), (0, 0))):
    return lax.conv_general_dilated(
        x, w, stride, padding, dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )


def _basic_conv(p: Params, prefix: str, x, stride=(1, 1), padding=((0, 0), (0, 0))):
    x = _conv(x, jnp.asarray(p[f"{prefix}.conv.weight"]), stride, padding)
    gamma = jnp.asarray(p[f"{prefix}.bn.weight"]).reshape(1, -1, 1, 1)
    beta = jnp.asarray(p[f"{prefix}.bn.bias"]).reshape(1, -1, 1, 1)
    mean = jnp.asarray(p[f"{prefix}.bn.running_mean"]).reshape(1, -1, 1, 1)
    var = jnp.asarray(p[f"{prefix}.bn.running_var"]).reshape(1, -1, 1, 1)
    x = (x - mean) * lax.rsqrt(var + BN_EPS) * gamma + beta
    return jnp.maximum(x, 0.0)


def _max_pool(x, k=3, s=2, pad=0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, k, k), (1, 1, s, s),
        ((0, 0), (0, 0), (pad, pad), (pad, pad)),
    )


def _avg_pool_nip(x, k=3, s=1, pad=1):
    """Average pool, count_include_pad=False (the FID-variant pooling)."""
    window = (1, 1, k, k)
    strides = (1, 1, s, s)
    pads = ((0, 0), (0, 0), (pad, pad), (pad, pad))
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, pads)
    counts = lax.reduce_window(jnp.ones_like(x), 0.0, lax.add, window, strides, pads)
    return summed / counts


# ---------------------------------------------------------------------------
# Inception blocks (channel specs of InceptionV3 / pytorch-fid)
# ---------------------------------------------------------------------------


def _inception_a(p, pre, x):
    b1 = _basic_conv(p, f"{pre}.branch1x1", x)
    b5 = _basic_conv(p, f"{pre}.branch5x5_1", x)
    b5 = _basic_conv(p, f"{pre}.branch5x5_2", b5, padding=((2, 2), (2, 2)))
    b3 = _basic_conv(p, f"{pre}.branch3x3dbl_1", x)
    b3 = _basic_conv(p, f"{pre}.branch3x3dbl_2", b3, padding=((1, 1), (1, 1)))
    b3 = _basic_conv(p, f"{pre}.branch3x3dbl_3", b3, padding=((1, 1), (1, 1)))
    bp = _avg_pool_nip(x)
    bp = _basic_conv(p, f"{pre}.branch_pool", bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(p, pre, x):
    b3 = _basic_conv(p, f"{pre}.branch3x3", x, stride=(2, 2))
    bd = _basic_conv(p, f"{pre}.branch3x3dbl_1", x)
    bd = _basic_conv(p, f"{pre}.branch3x3dbl_2", bd, padding=((1, 1), (1, 1)))
    bd = _basic_conv(p, f"{pre}.branch3x3dbl_3", bd, stride=(2, 2))
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _inception_c(p, pre, x):
    b1 = _basic_conv(p, f"{pre}.branch1x1", x)
    b7 = _basic_conv(p, f"{pre}.branch7x7_1", x)
    b7 = _basic_conv(p, f"{pre}.branch7x7_2", b7, padding=((0, 0), (3, 3)))
    b7 = _basic_conv(p, f"{pre}.branch7x7_3", b7, padding=((3, 3), (0, 0)))
    bd = _basic_conv(p, f"{pre}.branch7x7dbl_1", x)
    bd = _basic_conv(p, f"{pre}.branch7x7dbl_2", bd, padding=((3, 3), (0, 0)))
    bd = _basic_conv(p, f"{pre}.branch7x7dbl_3", bd, padding=((0, 0), (3, 3)))
    bd = _basic_conv(p, f"{pre}.branch7x7dbl_4", bd, padding=((3, 3), (0, 0)))
    bd = _basic_conv(p, f"{pre}.branch7x7dbl_5", bd, padding=((0, 0), (3, 3)))
    bp = _avg_pool_nip(x)
    bp = _basic_conv(p, f"{pre}.branch_pool", bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(p, pre, x):
    b3 = _basic_conv(p, f"{pre}.branch3x3_1", x)
    b3 = _basic_conv(p, f"{pre}.branch3x3_2", b3, stride=(2, 2))
    b7 = _basic_conv(p, f"{pre}.branch7x7x3_1", x)
    b7 = _basic_conv(p, f"{pre}.branch7x7x3_2", b7, padding=((0, 0), (3, 3)))
    b7 = _basic_conv(p, f"{pre}.branch7x7x3_3", b7, padding=((3, 3), (0, 0)))
    b7 = _basic_conv(p, f"{pre}.branch7x7x3_4", b7, stride=(2, 2))
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _inception_e(p, pre, x, pool: str):
    b1 = _basic_conv(p, f"{pre}.branch1x1", x)
    b3 = _basic_conv(p, f"{pre}.branch3x3_1", x)
    b3a = _basic_conv(p, f"{pre}.branch3x3_2a", b3, padding=((0, 0), (1, 1)))
    b3b = _basic_conv(p, f"{pre}.branch3x3_2b", b3, padding=((1, 1), (0, 0)))
    b3 = jnp.concatenate([b3a, b3b], axis=1)
    bd = _basic_conv(p, f"{pre}.branch3x3dbl_1", x)
    bd = _basic_conv(p, f"{pre}.branch3x3dbl_2", bd, padding=((1, 1), (1, 1)))
    bda = _basic_conv(p, f"{pre}.branch3x3dbl_3a", bd, padding=((0, 0), (1, 1)))
    bdb = _basic_conv(p, f"{pre}.branch3x3dbl_3b", bd, padding=((1, 1), (0, 0)))
    bd = jnp.concatenate([bda, bdb], axis=1)
    if pool == "avg":  # FIDInceptionE_1 (Mixed_7b)
        bp = _avg_pool_nip(x)
    else:  # FIDInceptionE_2 (Mixed_7c) uses a max pool
        bp = _max_pool(x, k=3, s=1, pad=1)
    bp = _basic_conv(p, f"{pre}.branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


def inception_pool3(params: Params, x: jax.Array) -> jax.Array:
    """(N, 3, 299, 299) in [-1, 1] -> (N, 2048) pool3 features."""
    p = params
    x = _basic_conv(p, "Conv2d_1a_3x3", x, stride=(2, 2))
    x = _basic_conv(p, "Conv2d_2a_3x3", x)
    x = _basic_conv(p, "Conv2d_2b_3x3", x, padding=((1, 1), (1, 1)))
    x = _max_pool(x)
    x = _basic_conv(p, "Conv2d_3b_1x1", x)
    x = _basic_conv(p, "Conv2d_4a_3x3", x)
    x = _max_pool(x)
    x = _inception_a(p, "Mixed_5b", x)
    x = _inception_a(p, "Mixed_5c", x)
    x = _inception_a(p, "Mixed_5d", x)
    x = _inception_b(p, "Mixed_6a", x)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(p, name, x)
    x = _inception_d(p, "Mixed_7a", x)
    x = _inception_e(p, "Mixed_7b", x, pool="avg")
    x = _inception_e(p, "Mixed_7c", x, pool="max")
    return jnp.mean(x, axis=(2, 3))  # adaptive avg pool to 1x1


def preprocess(images_0_255: jax.Array) -> jax.Array:
    """(N, H, W, 3) in [0, 255] -> (N, 3, 299, 299) in [-1, 1] (pytorch-fid
    preprocessing: /255, bilinear resize, x*2-1)."""
    x = images_0_255.astype(jnp.float32) / 255.0
    n = x.shape[0]
    # antialias OFF: pytorch-fid uses F.interpolate(mode='bilinear',
    # align_corners=False) which does not antialias — with the default
    # antialias=True, downscales (slices > 299 px) would diverge from the
    # published FID preprocessing
    x = jax.image.resize(x, (n, 299, 299, 3), method="bilinear", antialias=False)
    x = x * 2.0 - 1.0
    return x.transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# parameter shape table / init / conversion
# ---------------------------------------------------------------------------


def _bc_shapes(prefix, cin, cout, k) -> Dict[str, tuple]:
    kh, kw = (k, k) if isinstance(k, int) else k
    return {
        f"{prefix}.conv.weight": (cout, cin, kh, kw),
        f"{prefix}.bn.weight": (cout,),
        f"{prefix}.bn.bias": (cout,),
        f"{prefix}.bn.running_mean": (cout,),
        f"{prefix}.bn.running_var": (cout,),
    }


def inception_param_shapes() -> Dict[str, tuple]:
    s: Dict[str, tuple] = {}
    s.update(_bc_shapes("Conv2d_1a_3x3", 3, 32, 3))
    s.update(_bc_shapes("Conv2d_2a_3x3", 32, 32, 3))
    s.update(_bc_shapes("Conv2d_2b_3x3", 32, 64, 3))
    s.update(_bc_shapes("Conv2d_3b_1x1", 64, 80, 1))
    s.update(_bc_shapes("Conv2d_4a_3x3", 80, 192, 3))

    def block_a(pre, cin, pool_f):
        s.update(_bc_shapes(f"{pre}.branch1x1", cin, 64, 1))
        s.update(_bc_shapes(f"{pre}.branch5x5_1", cin, 48, 1))
        s.update(_bc_shapes(f"{pre}.branch5x5_2", 48, 64, 5))
        s.update(_bc_shapes(f"{pre}.branch3x3dbl_1", cin, 64, 1))
        s.update(_bc_shapes(f"{pre}.branch3x3dbl_2", 64, 96, 3))
        s.update(_bc_shapes(f"{pre}.branch3x3dbl_3", 96, 96, 3))
        s.update(_bc_shapes(f"{pre}.branch_pool", cin, pool_f, 1))

    block_a("Mixed_5b", 192, 32)
    block_a("Mixed_5c", 256, 64)
    block_a("Mixed_5d", 288, 64)

    s.update(_bc_shapes("Mixed_6a.branch3x3", 288, 384, 3))
    s.update(_bc_shapes("Mixed_6a.branch3x3dbl_1", 288, 64, 1))
    s.update(_bc_shapes("Mixed_6a.branch3x3dbl_2", 64, 96, 3))
    s.update(_bc_shapes("Mixed_6a.branch3x3dbl_3", 96, 96, 3))

    def block_c(pre, c7):
        s.update(_bc_shapes(f"{pre}.branch1x1", 768, 192, 1))
        s.update(_bc_shapes(f"{pre}.branch7x7_1", 768, c7, 1))
        s.update(_bc_shapes(f"{pre}.branch7x7_2", c7, c7, (1, 7)))
        s.update(_bc_shapes(f"{pre}.branch7x7_3", c7, 192, (7, 1)))
        s.update(_bc_shapes(f"{pre}.branch7x7dbl_1", 768, c7, 1))
        s.update(_bc_shapes(f"{pre}.branch7x7dbl_2", c7, c7, (7, 1)))
        s.update(_bc_shapes(f"{pre}.branch7x7dbl_3", c7, c7, (1, 7)))
        s.update(_bc_shapes(f"{pre}.branch7x7dbl_4", c7, c7, (7, 1)))
        s.update(_bc_shapes(f"{pre}.branch7x7dbl_5", c7, 192, (1, 7)))
        s.update(_bc_shapes(f"{pre}.branch_pool", 768, 192, 1))

    block_c("Mixed_6b", 128)
    block_c("Mixed_6c", 160)
    block_c("Mixed_6d", 160)
    block_c("Mixed_6e", 192)

    s.update(_bc_shapes("Mixed_7a.branch3x3_1", 768, 192, 1))
    s.update(_bc_shapes("Mixed_7a.branch3x3_2", 192, 320, 3))
    s.update(_bc_shapes("Mixed_7a.branch7x7x3_1", 768, 192, 1))
    s.update(_bc_shapes("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7)))
    s.update(_bc_shapes("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1)))
    s.update(_bc_shapes("Mixed_7a.branch7x7x3_4", 192, 192, 3))

    def block_e(pre, cin):
        s.update(_bc_shapes(f"{pre}.branch1x1", cin, 320, 1))
        s.update(_bc_shapes(f"{pre}.branch3x3_1", cin, 384, 1))
        s.update(_bc_shapes(f"{pre}.branch3x3_2a", 384, 384, (1, 3)))
        s.update(_bc_shapes(f"{pre}.branch3x3_2b", 384, 384, (3, 1)))
        s.update(_bc_shapes(f"{pre}.branch3x3dbl_1", cin, 448, 1))
        s.update(_bc_shapes(f"{pre}.branch3x3dbl_2", 448, 384, 3))
        s.update(_bc_shapes(f"{pre}.branch3x3dbl_3a", 384, 384, (1, 3)))
        s.update(_bc_shapes(f"{pre}.branch3x3dbl_3b", 384, 384, (3, 1)))
        s.update(_bc_shapes(f"{pre}.branch_pool", cin, 192, 1))

    block_e("Mixed_7b", 1280)
    block_e("Mixed_7c", 2048)
    return s


def random_inception_params(seed: int = 0) -> Params:
    """Correct-shaped random params (tests / structure validation)."""
    rng = np.random.default_rng(seed)
    out: Params = {}
    for k, shape in inception_param_shapes().items():
        if k.endswith("running_var"):
            out[k] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        elif k.endswith("bn.weight"):
            out[k] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        elif k.endswith(("running_mean", "bn.bias")):
            out[k] = (rng.normal(0, 0.1, shape)).astype(np.float32)
        else:
            fan_in = int(np.prod(shape[1:]))
            out[k] = (rng.normal(0, 1, shape) / np.sqrt(fan_in)).astype(np.float32)
    return out


def convert_torch_state_dict(path: str) -> Params:
    """pt_inception state dict (.pth) -> name-keyed numpy params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    shapes = inception_param_shapes()
    out: Params = {}
    for k, shape in shapes.items():
        if k not in sd:
            raise KeyError(f"state dict missing {k}")
        v = np.asarray(sd[k].detach().cpu().numpy(), np.float32)
        assert tuple(v.shape) == tuple(shape), (k, v.shape, shape)
        out[k] = v
    return out


def save_inception_npz(params: Params, path: str) -> str:
    np.savez(path, **params)
    return path


def load_inception_npz(path: str) -> Params:
    data = np.load(path)
    return {k: data[k] for k in data.files}


class InceptionPool3Features:
    """FID feature extractor over this network. Input: (N, H, W, 3) in
    [0, 255] (what fid.get_activations_from_volume feeds)."""

    def __init__(self, params: Params):
        # one-time transfer: ~95 MB of weights would otherwise ride
        # host->device on every extract() call
        self.params = jax.device_put(params)
        self._fn = jax.jit(lambda p, x: inception_pool3(p, preprocess(x)))

    def extract(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(self.params, jnp.asarray(images)), np.float32)
