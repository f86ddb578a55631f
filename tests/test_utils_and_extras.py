"""Tests for the remaining inventory items: spectral norm, grouped/depthwise
convs, ExtendedEMA class API, utils helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saragan_tpu import ops
from saragan_tpu.ops.core import depthwise_conv, group_conv, spectral_normalize
from saragan_tpu.optim.ema import ExtendedEMA
from saragan_tpu.utils import (
    count_parameters,
    dump_weight_for_debugging,
    get_num_metric_samples,
    uniform_box_sampler,
)


def test_spectral_normalize_unit_sigma(np_rng):
    w = jnp.asarray(np_rng.normal(size=(3, 3, 3, 8, 16)).astype(np.float32))
    u = jnp.asarray(np_rng.normal(size=(1, 16)).astype(np.float32))
    w_sn, u_new = spectral_normalize(w, u, iterations=30)
    # after many power iterations the top singular value of w_sn -> 1
    s = np.linalg.svd(np.asarray(w_sn).reshape(-1, 16), compute_uv=False)
    np.testing.assert_allclose(s[0], 1.0, rtol=1e-3)
    assert u_new.shape == u.shape


def test_group_conv_matches_split(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 8, 4, 4, 4)).astype(np.float32))
    w = jnp.asarray(np_rng.normal(size=(3, 3, 3, 4, 8)).astype(np.float32)) * 0.1
    y = group_conv(x, w, groups=2)
    assert y.shape == (2, 8, 4, 4, 4)
    # oracle: two independent convs on channel halves
    from saragan_tpu.ops.core import conv_apply

    y0 = conv_apply(x[:, :4], w[..., :4])
    y1 = conv_apply(x[:, 4:], w[..., 4:])
    np.testing.assert_allclose(
        np.asarray(y), np.concatenate([np.asarray(y0), np.asarray(y1)], axis=1),
        rtol=1e-4, atol=1e-5,
    )


def test_depthwise_conv(np_rng):
    x = jnp.asarray(np_rng.normal(size=(1, 4, 4, 4, 4)).astype(np.float32))
    w = jnp.asarray(np_rng.normal(size=(3, 3, 3, 1, 4)).astype(np.float32))
    y = depthwise_conv(x, w)
    assert y.shape == x.shape


def test_extended_ema_swap():
    params = {"a": jnp.asarray(1.0)}
    ema = ExtendedEMA(params, decay=0.5)
    params2 = {"a": jnp.asarray(3.0)}
    ema.apply(params2)
    # shadow = 0.5*1 + 0.5*3 = 2
    np.testing.assert_allclose(float(ema.shadow["a"]), 2.0)
    averaged = ema.assign_ema_weights(params2)
    np.testing.assert_allclose(float(averaged["a"]), 2.0)
    restored = ema.restore_original_weights()
    np.testing.assert_allclose(float(restored["a"]), 3.0)
    with pytest.raises(AssertionError):
        ema.restore_original_weights()


def test_utils_helpers(capsys, np_rng):
    assert get_num_metric_samples(None, 4, 2) == 8
    assert get_num_metric_samples(None, 1, 2) == 4
    assert get_num_metric_samples(99, 4, 2) == 99
    assert count_parameters({"g/w": jnp.zeros((2, 3))}, "g") == 6
    dump_weight_for_debugging({"g/w": jnp.ones((2, 2))}, "g/w")
    out = capsys.readouterr().out
    assert "g/w[0][0]: 1.0" in out
    dump_weight_for_debugging({}, "nope")
    assert "not in params" in capsys.readouterr().out

    arr = np_rng.normal(size=(10, 10))
    slices, box = uniform_box_sampler(arr, 2, 4, rng=np.random.default_rng(0))
    assert box.ndim == 2 and len(slices) == 2


def test_memory_summary_scalars():
    """Memory telemetry family (reference SURFGAN_2D/main.py:423-425 RSS%;
    device HBM stats are the TPU-native upgrade of SURVEY §5.1)."""
    from saragan_tpu.train import summaries as summ

    out = summ.memory_summary()
    assert "memory/host_rss_percent" in out
    assert 0.0 < out["memory/host_rss_percent"] < 100.0
    for v in out.values():
        assert np.isfinite(v)


def test_flagship_blob_pyramid_levels_are_consistent():
    """The flagship convergence harness evaluates ONE analytic field per
    seed at every resolution (scripts/convergence_run_flagship.py) — the
    synthetic analog of the reference's per-resolution Lanczos pyramid
    (data_scripts/process_lidc_idri_data.py:124-137).  Levels must be
    deterministic per seed, anisotropic (depth = width/4), and mutually
    consistent: box-downsampling the fine level approximates the coarse."""
    import os
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from convergence_run_flagship import make_blob_volume_aniso

    a = make_blob_volume_aniso(123, 64)
    b = make_blob_volume_aniso(123, 64)
    np.testing.assert_array_equal(a, b)  # deterministic
    assert a.shape == (16, 64, 64)

    coarse = make_blob_volume_aniso(123, 32)
    assert coarse.shape == (8, 32, 32)
    fine_ds = a.reshape(8, 2, 32, 2, 32, 2).mean(axis=(1, 3, 5))
    # same continuous field sampled at 2x: box-mean of the fine grid must
    # track the coarse grid closely relative to the field's dynamic range
    # (point-sampled grids have endpoint offsets, so the max sits at blob
    # edges; the mean is the consistency signal)
    rng_span = a.max() - a.min()
    err = np.abs(fine_ds - coarse).mean() / rng_span
    assert err < 0.03, err

    other = make_blob_volume_aniso(124, 32)
    other_err = np.abs(other - coarse).mean() / rng_span
    assert other_err > 5 * err  # different seed, genuinely different field
