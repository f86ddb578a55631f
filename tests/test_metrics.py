"""Metric tests mirroring the reference's self-tests (SURVEY §4):
SWD ordering batteries, SSIM/PSNR/MSE/NRMSE oracles, FID sanity,
save_metrics orchestration."""

import jax
import numpy as np
import pytest

from saragan_tpu.metrics import (
    calculate_fid_given_batch_volumes,
    frechet_distance,
    get_mean_squared_error,
    get_normalized_root_mse,
    get_psnr,
    get_ssim,
    get_swd_for_volumes,
    save_metrics,
    structural_similarity,
)
from saragan_tpu.metrics.fid import RandomConvFeatures
from saragan_tpu.metrics.swd import (
    generate_laplacian_pyramid,
    reconstruct_laplacian_pyramid,
)


# ---------------------------------------------------------------------------
# SWD
# ---------------------------------------------------------------------------


def test_laplacian_pyramid_reconstructs(np_rng):
    x = np_rng.normal(size=(2, 1, 8, 32, 32)).astype(np.float32)
    # (generate_laplacian_pyramid is pure here — the reference's in-place
    # mutation of f32 inputs was a bug, fixed; see swd.py)
    pyr = generate_laplacian_pyramid(x, 2)
    rec = reconstruct_laplacian_pyramid(pyr)
    np.testing.assert_allclose(rec, x, atol=1e-4)


def test_swd_identical_is_small_and_orders(np_rng):
    shape = (8, 1, 8, 32, 32)
    a = np_rng.normal(size=shape).astype(np.float32)
    b = np_rng.normal(size=shape).astype(np.float32)
    c = np.zeros(shape, np.float32)
    swd_ab = get_swd_for_volumes(a, b, nhoods_per_image=64, dir_repeats=2, dirs_per_repeat=64)
    swd_ac = get_swd_for_volumes(a, c, nhoods_per_image=64, dir_repeats=2, dirs_per_repeat=64)
    # noise/noise distance << noise/constant distance
    assert swd_ab[-1] < swd_ac[-1]
    # resolutions 32 and 16 -> 2 LODs + appended mean
    assert len(swd_ab) == 3


def test_swd_too_small_returns_none(np_rng):
    x = np_rng.normal(size=(2, 1, 4, 8, 8)).astype(np.float32)
    assert get_swd_for_volumes(x, x) is None


# ---------------------------------------------------------------------------
# SSIM / PSNR / MSE / NRMSE
# ---------------------------------------------------------------------------


def test_mse_psnr_nrmse_oracles(np_rng):
    a = np_rng.normal(size=(1, 1, 8, 16, 16)).astype(np.float32)
    b = a + 1.0
    assert np.isclose(get_mean_squared_error(a, b), 1.0)
    assert np.isclose(get_psnr(a, b), 10 * np.log10(3072**2))
    expected_nrmse = 1.0 / (a.max() - a.min())
    assert np.isclose(get_normalized_root_mse(a, b), expected_nrmse, rtol=1e-6)


def test_ssim_self_is_one(np_rng):
    a = np_rng.normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    vals = get_ssim(a, a.copy())
    assert np.allclose(vals, 1.0)


def test_ssim_decreases_with_noise(np_rng):
    a = np_rng.normal(size=(2, 1, 16, 16, 16)).astype(np.float32)
    small = get_ssim(a, a + 0.1 * np_rng.normal(size=a.shape).astype(np.float32))[0]
    big = get_ssim(a, a + 1.0 * np_rng.normal(size=a.shape).astype(np.float32))[0]
    assert 0 < big < small < 1.0


def test_ssim_singleton_batch_is_per_slice(np_rng):
    """Reference quirk (skim_metrics.py:23-26): a batch of exactly 1 volume
    is stripped and SSIM iterates the DEPTH axis -> D per-slice 2D values."""
    a = np_rng.normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    out = get_ssim(a, a + 0.1 * np_rng.normal(size=a.shape).astype(np.float32))
    assert len(out) == 16  # one SSIM per z-slice, not one 3D SSIM


def test_ssim_known_value():
    """Cross-checked against skimage.structural_similarity (gaussian_weights,
    data_range=1) on a deterministic ramp pair."""
    x = np.linspace(0, 1, 32 * 32, dtype=np.float64).reshape(32, 32)
    y = x**2
    val = structural_similarity(x, y, data_range=1.0, gaussian_weights=True)
    assert 0.3 < val < 1.0
    # uniform-filter variant also runs
    val2 = structural_similarity(x, y, data_range=1.0)
    assert 0.3 < val2 < 1.0


# ---------------------------------------------------------------------------
# FID
# ---------------------------------------------------------------------------


def test_frechet_distance_zero_for_identical(np_rng):
    act = np_rng.normal(size=(64, 16)).astype(np.float64)
    d = frechet_distance(act, act.copy())
    assert abs(d) < 1e-6


def test_frechet_distance_mean_shift(np_rng):
    a = np_rng.normal(size=(2000, 4))
    b = a + np.array([1.0, 0, 0, 0])
    d = frechet_distance(a, b)
    assert 0.9 < d < 1.1  # ||mu1-mu2||^2 = 1, covs equal


def test_fid_volume_pipeline_orders(np_rng):
    extractor = RandomConvFeatures(out_dim=64)
    real = np_rng.normal(size=(2, 1, 4, 16, 16)).astype(np.float32)
    similar = real + 0.1 * np_rng.normal(size=real.shape).astype(np.float32)
    different = np_rng.normal(size=real.shape).astype(np.float32) * 0.2 + 1.5
    fid_close = calculate_fid_given_batch_volumes(real, similar, extractor, verbose=False)
    fid_far = calculate_fid_given_batch_volumes(real, different, extractor, verbose=False)
    assert fid_close < fid_far
    with pytest.raises(Exception):
        calculate_fid_given_batch_volumes(real, real[:1], extractor)


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------


def test_save_metrics_dict_and_tags(np_rng):
    data = np_rng.normal(size=(8, 1, 4, 16, 16)).astype(np.float32)

    class DS:
        shape = (1, 1, 4, 16, 16)

        def batch(self, n):
            # NumpyPathDataset.batch returns (n, 1, *vol) with channel axis
            return data[:n]

        def __len__(self):
            return 8

    written = {}

    class W:
        def scalars(self, d, step):
            written.update(d)

    def sample_fn(rng, n):
        return np.asarray(jax.random.normal(rng, (n, 1, 4, 16, 16)), np.float32)

    compute = dict(
        compute_FID=True,
        compute_swds=True,
        compute_ssims=False,  # min dim 4 < 16 gates it off anyway
        compute_psnrs=True,
        compute_mses=True,
        compute_nrmses=True,
    )
    m = save_metrics(
        W(), sample_fn, DS(), batch_size=4, global_size=1, global_step=10,
        imagesize_xy=16, compute_metrics=compute, num_metric_samples=4,
        data_mean=None, data_stddev=None, verbose=False,
        suffix="_EMA", extractor=RandomConvFeatures(out_dim=32),
    )
    assert {"FID", "psnr", "mse", "nrmse", "swd"} <= set(m)
    assert "fid_EMA" in written and "PSNR_EMA" in written
    assert "swd_16_EMA" in written and "swd_mean_EMA" in written


# ---------------------------------------------------------------------------
# FID integrity (VERDICT r1: no silent random-feature fallback)
# ---------------------------------------------------------------------------


def test_default_extractor_hard_fails_without_weights(monkeypatch):
    from saragan_tpu.metrics.fid import UncalibratedFIDError, default_extractor

    monkeypatch.delenv("SARAGAN_INCEPTION_NPZ", raising=False)
    monkeypatch.delenv("SARAGAN_ALLOW_UNCALIBRATED_FID", raising=False)
    with pytest.raises(UncalibratedFIDError):
        default_extractor()


def test_default_extractor_explicit_optin(monkeypatch):
    from saragan_tpu.metrics.fid import default_extractor

    monkeypatch.delenv("SARAGAN_INCEPTION_NPZ", raising=False)
    with pytest.warns(UserWarning, match="NOT"):
        ex = default_extractor(allow_uncalibrated=True)
    assert ex.calibrated is False


def test_metrics_callback_fid_calibration_flag(monkeypatch):
    from saragan_tpu.config import Config
    from saragan_tpu.metrics.fid import UncalibratedFIDError
    from saragan_tpu.metrics.save_metrics import make_metrics_callback

    monkeypatch.delenv("SARAGAN_INCEPTION_NPZ", raising=False)
    monkeypatch.delenv("SARAGAN_ALLOW_UNCALIBRATED_FID", raising=False)
    cfg = Config(compute_FID=True)
    with pytest.raises(UncalibratedFIDError):
        make_metrics_callback(cfg)  # fails at setup, not mid-training
    cfg2 = Config(compute_FID=True, allow_uncalibrated_fid=True)
    with pytest.warns(UserWarning):
        cb = make_metrics_callback(cfg2)
    assert cb.fid_calibrated is False
    cfg3 = Config(compute_FID=False)
    cb3 = make_metrics_callback(cfg3)
    assert cb3.fid_calibrated is True  # no FID -> nothing uncalibrated


def test_save_metrics_consumes_exact_distinct_samples(np_rng):
    """num_metric_samples means distinct samples regardless of global_size
    (VERDICT r1 weak #6), and pooled FID sees them all in one set."""
    data = np_rng.normal(size=(16, 1, 4, 16, 16)).astype(np.float32)
    consumed = []

    class DS:
        shape = (1, 1, 4, 16, 16)

        def batch(self, n):
            consumed.append(n)
            return data[:n]

        def __len__(self):
            return 16

    def sample_fn(rng, n):
        return np.asarray(jax.random.normal(rng, (n, 1, 4, 16, 16)), np.float32)

    m = save_metrics(
        None, sample_fn, DS(), batch_size=4, global_size=8, global_step=1,
        imagesize_xy=16, compute_metrics=dict(compute_FID=True), num_metric_samples=12,
        data_mean=None, data_stddev=None, verbose=False,
        extractor=RandomConvFeatures(out_dim=32),
    )
    assert sum(consumed) == 12  # not 12/global_size
    assert "FID" in m


def test_save_metrics_pooled_vs_per_batch(np_rng):
    """Pooled FID equals a single big-batch FID; per_batch averages differ."""
    data = np_rng.normal(size=(8, 1, 4, 16, 16)).astype(np.float32)
    fakes = np_rng.normal(size=(8, 1, 4, 16, 16)).astype(np.float32) * 0.5

    class DS:
        shape = (1, 1, 4, 16, 16)
        idx = 0

        def batch(self, n):
            b = data[self.idx:self.idx + n]
            DS.idx += n
            return b

        def __len__(self):
            return 8

    calls = {"i": 0}

    def sample_fn(rng, n):
        b = fakes[calls["i"]:calls["i"] + n]
        calls["i"] += n
        return b

    ex = RandomConvFeatures(out_dim=16)
    m = save_metrics(
        None, sample_fn, DS(), batch_size=4, global_size=1, global_step=1,
        imagesize_xy=16, compute_metrics=dict(compute_FID=True), num_metric_samples=8,
        data_mean=None, data_stddev=None, verbose=False, extractor=ex,
    )
    oracle = calculate_fid_given_batch_volumes(data, fakes, ex, verbose=False)
    np.testing.assert_allclose(m["FID"], oracle, rtol=1e-5)


def test_swd_does_not_mutate_inputs():
    """Reference bug fixed here: swd.py:78's np.float32() aliased f32 inputs
    and the pyramid subtraction corrupted them — poisoning every metric the
    reference computed after SWD on the same batch (save_metrics.py:159-196)."""
    from saragan_tpu.metrics.swd import get_swd_for_volumes

    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 1, 32, 32, 32)).astype(np.float32)
    b = rng.normal(size=(4, 1, 32, 32, 32)).astype(np.float32)
    a0, b0 = a.copy(), b.copy()
    get_swd_for_volumes(a, b)
    np.testing.assert_array_equal(a, a0)
    np.testing.assert_array_equal(b, b0)


def test_pyr_down_separable_matches_dense_oracle():
    """The separable [1,4,6,4,1]-per-axis fast path must equal the
    reference's dense 5x5x5 convolution (outer-product filter, mirror
    boundary factorizes per axis)."""
    from saragan_tpu.metrics.swd import _pyr_down_dense, pyr_down

    x = np.random.default_rng(3).normal(size=(2, 1, 16, 16, 16)).astype(np.float32)
    np.testing.assert_allclose(pyr_down(x), _pyr_down_dense(x), atol=2e-6)


def test_sliced_wasserstein_transposed_sort_is_exact():
    """Row-sorting the transposed projections is value-identical to the
    reference's axis=0 column sort (swd.py:45-59)."""
    from saragan_tpu.metrics.swd import sliced_wasserstein

    rng = np.random.default_rng(0)
    a = rng.normal(size=(512, 64)).astype(np.float32)
    b = rng.normal(size=(512, 64)).astype(np.float32)
    ours = sliced_wasserstein(a, b, 3, 32, np.random.default_rng(9))

    rng2 = np.random.default_rng(9)
    res = []
    for _ in range(3):
        dirs = rng2.standard_normal((a.shape[1], 32))
        dirs /= np.sqrt(np.sum(np.square(dirs), axis=0, keepdims=True))
        dirs = dirs.astype(np.float32)
        pa = np.sort(np.matmul(a, dirs), axis=0)
        pb = np.sort(np.matmul(b, dirs), axis=0)
        res.append(np.mean(np.abs(pa - pb), dtype=np.float64))
    assert abs(ours - np.mean(res)) < 1e-12
