"""Input normalization utilities — bit-matched ports of reference
dataset.py:15-118 (numpy paths; the in-graph variants are the same math and
happen inside the jitted step when needed)."""

from __future__ import annotations

import numpy as np


def stdnormal_to_8bit_numpy(normalized_input, verbose: bool = False):
    """Map standard-normal data to [0, 255] ints: 0 -> 128, ±2 SD -> 0/256,
    then clip (reference dataset.py:15-26)."""
    image_8bit = np.clip((64 * normalized_input + 128), 0, 255)
    return image_8bit.astype(int)


def _check(mean, stddev):
    if mean is None and stddev is not None:
        raise Exception(
            "ERROR: data_stddev was defined, but data_mean was not. Either define both to "
            "apply input normalization, or define neither to not apply input normalization"
        )
    if mean is not None and stddev is None:
        raise Exception(
            "ERROR: data_mean was defined, but data_stddev was not. Either define both to "
            "apply input normalization, or define neither to not apply input normalization"
        )


def normalize_numpy(unnormalized_input, mean, stddev, verbose: bool = False):
    """(x - mean) / stddev, or identity when both are None (reference
    dataset.py:78-97)."""
    if mean is None and stddev is None:
        return unnormalized_input
    _check(mean, stddev)
    return (unnormalized_input - mean) / stddev


def invert_normalize_numpy(normalized_input, mean, stddev, verbose: bool = False):
    """x * stddev + mean (reference dataset.py:99-118)."""
    if mean is None and stddev is None:
        return normalized_input
    _check(mean, stddev)
    return (normalized_input * stddev) + mean
