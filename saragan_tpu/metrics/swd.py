"""Sliced Wasserstein Distance on a 3D Laplacian pyramid.

Port of reference metrics/swd.py:5-124 (numerics preserved): 5x5x5 binomial
([1,4,6,4,1]^x3) pyramid filters, 512 random (2,8,8)-neighbourhood
descriptors per volume, per-LOD channel standardization, 8 repeats x 512
random projections, sorted-projection L1.  Host-side numpy: the metric is
evaluation-only, O(batch) work, and sort-heavy — a poor fit for the MXU.
The reference uses the global numpy RNG; we accept a seedable Generator
(default: fresh `np.random.default_rng(seed)`) for reproducible evals.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import scipy.ndimage

_f = np.array([1, 4, 6, 4, 1], dtype=np.float32)
_f3 = _f[:, None, None] * _f[None, None, :] * _f[None, :, None]
_GAUSSIAN_FILTER = (_f3 / _f3.sum()).reshape(5, 5, 5)


def get_descriptors_for_minibatch(minibatch, nhood_size, nhoods_per_image, rng):
    """Random neighbourhood crops (reference swd.py:13-27)."""
    S = minibatch.shape  # (N, C, D, H, W)
    assert len(S) == 5
    N = nhoods_per_image * S[0]
    D, H, W = nhood_size[0] // 2, nhood_size[1] // 2, nhood_size[2] // 2
    nhood, chan, d, x, y = np.ogrid[0:N, 0 : S[1], -D : D + 1, -H : H + 1, -W : W + 1]
    img = nhood // nhoods_per_image
    d = d + rng.integers(D, S[2] - D, size=(N, 1, 1, 1, 1))
    x = x + rng.integers(W, S[4] - W, size=(N, 1, 1, 1, 1))
    y = y + rng.integers(H, S[3] - H, size=(N, 1, 1, 1, 1))
    idx = (((img * S[1] + chan) * S[2] + d) * S[3] + y) * S[4] + x
    return minibatch.flat[idx]


def finalize_descriptors(desc):
    """reference swd.py:32-40."""
    if isinstance(desc, list):
        desc = np.concatenate(desc, axis=0)
    assert desc.ndim == 5
    if desc.shape[1] > 1:
        desc -= np.mean(desc, axis=(0, 2, 3, 4), keepdims=True)
        desc /= np.std(desc, axis=(0, 2, 3, 4), keepdims=True)
    return desc.reshape(desc.shape[0], -1)


def sliced_wasserstein(a, b, dir_repeats, dirs_per_repeat, rng):
    """reference swd.py:45-59."""
    assert a.ndim == 2 and a.shape[1] == b.shape[1]
    results = []
    for _ in range(dir_repeats):
        dirs = rng.standard_normal((a.shape[1], dirs_per_repeat))
        dirs /= np.sqrt(np.sum(np.square(dirs), axis=0, keepdims=True))
        dirs = dirs.astype(np.float32)
        projA = np.sort(np.matmul(a, dirs), axis=0)
        projB = np.sort(np.matmul(b, dirs), axis=0)
        results.append(np.mean(np.abs(projA - projB)))
    return np.mean(results)


def pyr_down(minibatch):
    assert minibatch.ndim == 5
    return scipy.ndimage.convolve(
        minibatch, _GAUSSIAN_FILTER[np.newaxis, np.newaxis, ...], mode="mirror"
    )[:, :, ::2, ::2, ::2]


def pyr_up(minibatch):
    assert minibatch.ndim == 5
    S = minibatch.shape
    res = np.zeros((S[0], S[1], S[2] * 2, S[3] * 2, S[4] * 2), minibatch.dtype)
    res[:, :, ::2, ::2, ::2] = minibatch
    return scipy.ndimage.convolve(
        res, _GAUSSIAN_FILTER[np.newaxis, np.newaxis, ...] * 8.0, mode="mirror"
    )


def generate_laplacian_pyramid(minibatch, num_levels):
    pyramid = [np.float32(minibatch)]
    for _ in range(1, num_levels):
        pyramid.append(pyr_down(pyramid[-1]))
        pyramid[-2] -= pyr_up(pyramid[-1])
    return pyramid


def reconstruct_laplacian_pyramid(pyramid):
    minibatch = pyramid[-1]
    for level in pyramid[-2::-1]:
        minibatch = pyr_up(minibatch) + level
    return minibatch


def get_swd_for_volumes(
    images1,
    images2,
    nhood_size=(2, 8, 8),
    nhoods_per_image=512,
    dir_repeats=8,
    dirs_per_repeat=512,
    rng: Optional[np.random.Generator] = None,
) -> Optional[List[float]]:
    """Per-LOD SWD + mean (reference swd.py:96-124). Returns None if the
    resolution is below 16 (no LODs)."""
    if rng is None:
        rng = np.random.default_rng(0)
    resolutions = []
    res = images1.shape[-1]
    while res >= 16:
        resolutions.append(res)
        res //= 2
    if not resolutions:
        print("No descriptors, probably resolution is too small. Returning None")
        return None

    descriptors_real = [
        get_descriptors_for_minibatch(level, nhood_size, nhoods_per_image, rng)
        for level in generate_laplacian_pyramid(images1, len(resolutions))
    ]
    descriptors_fake = [
        get_descriptors_for_minibatch(level, nhood_size, nhoods_per_image, rng)
        for level in generate_laplacian_pyramid(images2, len(resolutions))
    ]
    descriptors_real = [finalize_descriptors(d) for d in descriptors_real]
    descriptors_fake = [finalize_descriptors(d) for d in descriptors_fake]

    dist = [
        sliced_wasserstein(dr, df, dir_repeats, dirs_per_repeat, rng)
        for dr, df in zip(descriptors_real, descriptors_fake)
    ]
    return dist + [np.mean(dist)]
