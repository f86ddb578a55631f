"""KS intensity-distribution metric (reference pgan_pytorch/metrics/kms.py)."""

import numpy as np
import pytest

from saragan_tpu.metrics.kms import kolmogorov_smirnov_distance

# the prototype's call signature: kms(real, fake, -1024, (-1024, 2048))
# (reference pgan_pytorch/train.py:13)
INTERCEPT = -1024
CLIP = (-1024, 2048)


def _vols(rng, n=4, shape=(1, 8, 8, 8), loc=0.0, scale=1.0):
    return rng.normal(loc, scale, (n,) + shape).astype(np.float32)


def test_identical_batches_are_zero():
    rng = np.random.default_rng(0)
    x = _vols(rng)
    assert kolmogorov_smirnov_distance(x, x.copy(), INTERCEPT, CLIP) == 0.0
    assert kolmogorov_smirnov_distance(x, x.copy(), INTERCEPT, CLIP, cumulative=True) == 0.0


def test_discriminates_distribution_shift_monotonically():
    rng = np.random.default_rng(1)
    real = _vols(rng, n=8)
    near = _vols(rng, n=8, loc=0.05)
    far = _vols(rng, n=8, loc=0.8)
    d_near = kolmogorov_smirnov_distance(real, near, INTERCEPT, CLIP)
    d_far = kolmogorov_smirnov_distance(real, far, INTERCEPT, CLIP)
    assert 0.0 < d_near < d_far
    # textbook-KS variant discriminates the same ordering
    c_near = kolmogorov_smirnov_distance(real, near, INTERCEPT, CLIP, cumulative=True)
    c_far = kolmogorov_smirnov_distance(real, far, INTERCEPT, CLIP, cumulative=True)
    assert 0.0 < c_near < c_far
    assert c_far <= 1.0 + 1e-12  # CDF gap is bounded


def test_matches_hand_computed_two_sample_case():
    # 2 samples x 1 channel x 2x2x2 voxels with hand-checkable histograms.
    # intercept 2, clip (0, 4) -> HU = 2x + 2 in {0..4}, 4 bins.
    real = np.zeros((2, 1, 2, 2, 2), np.float32)  # all HU = 2
    fake = np.full((2, 1, 2, 2, 2), -1.0, np.float32)  # all HU = 0
    # constant sample: np.histogram puts everything in one bin over
    # [v - 0.5, v + 0.5] (numpy widens a zero-width range), density sums
    # to 1/binwidth... verify against a literal numpy transcription:
    def oracle(r, f):
        r = ((r * 2) + 2).astype(int).clip(0, 4).mean(1).reshape(r.shape[0], -1)
        f = ((f * 2) + 2).astype(int).clip(0, 4).mean(1).reshape(r.shape[0], -1)
        rh = np.stack([np.histogram(r[i], bins=4, density=True)[0] for i in range(2)])
        fh = np.stack([np.histogram(f[i], bins=4, density=True)[0] for i in range(2)])
        return abs(rh.mean(0) - fh.mean(0)).max()

    got = kolmogorov_smirnov_distance(real, fake, intercept=2, clip_range=(0, 4))
    assert got == pytest.approx(oracle(real, fake))


def test_reference_batch_quirk_preserved():
    # fake is reshaped with REAL's batch size (kms.py:16).  When fake's
    # voxel count doesn't divide by real's batch, that reshape fails —
    # exactly as upstream would (when it DOES divide, upstream silently
    # regroups fake voxels across samples; both behaviors are preserved).
    rng = np.random.default_rng(2)
    real = _vols(rng, n=3)
    fake = _vols(rng, n=4)
    with pytest.raises(ValueError):
        kolmogorov_smirnov_distance(real, fake, INTERCEPT, CLIP)
    # divisible mismatch: regrouped, but still a finite scalar
    d = kolmogorov_smirnov_distance(_vols(rng, n=2), _vols(rng, n=4), INTERCEPT, CLIP)
    assert np.isfinite(d)


def test_2d_nchw_inputs_work():
    rng = np.random.default_rng(3)
    real = rng.normal(size=(4, 3, 16, 16)).astype(np.float32)
    fake = rng.normal(0.5, 1.0, size=(4, 3, 16, 16)).astype(np.float32)
    d = kolmogorov_smirnov_distance(real, fake, INTERCEPT, CLIP)
    assert np.isfinite(d) and d > 0


def test_cumulative_detects_scale_difference():
    """Uniform HU on [0,500) vs [0,1000): the true two-sample KS is 0.5.
    The PDF branch's per-sample-range histograms are scale/location
    invariant (documented reference quirk) and read ~0 here; the
    cumulative variant histograms over the FIXED clip_range support and
    must resolve it."""
    rng = np.random.default_rng(4)

    def to_x(hu):  # invert hu = (x * intercept) + intercept
        return ((hu - INTERCEPT) / INTERCEPT).astype(np.float32)

    real = to_x(rng.uniform(0, 500, (4, 1, 8, 8, 8)))
    fake = to_x(rng.uniform(0, 1000, (4, 1, 8, 8, 8)))
    same = to_x(rng.uniform(0, 500, (4, 1, 8, 8, 8)))
    d = kolmogorov_smirnov_distance(real, fake, INTERCEPT, CLIP, cumulative=True)
    d0 = kolmogorov_smirnov_distance(real, same, INTERCEPT, CLIP, cumulative=True)
    assert d == pytest.approx(0.5, abs=0.06)
    assert d0 < 0.08 < d
