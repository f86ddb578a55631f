"""Data preparation pipeline tests (C27)."""

import gzip
import os

import numpy as np
import pytest

from saragan_tpu.tools.prepare_data import (
    block_reduce_absmax,
    block_reduce_lanczos,
    block_reduce_mean,
    build_pyramid,
    clip_pad_normalize,
    create_dataset,
    lanczos_3d_filter,
    pack_npy_to_hdf5,
    process_volume,
    read_nrrd,
    resample_volume,
)


def test_lanczos_filter_normalized():
    for k in (2, 4, 8):
        f = lanczos_3d_filter(k)
        assert f.shape == (k, k, k)
        np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-6)


def test_block_reduce_constant_preserved():
    x = np.full((8, 8, 8), 3.0, np.float32)
    np.testing.assert_allclose(block_reduce_lanczos(x, 2), np.full((4, 4, 4), 3.0), rtol=1e-5)
    np.testing.assert_allclose(block_reduce_mean(x, 4), np.full((2, 2, 2), 3.0), rtol=1e-6)


def test_block_reduce_absmax_signed():
    x = np.zeros((4, 4, 4), np.float32)
    x[0, 0, 0] = -5.0
    x[2, 2, 2] = 2.0
    out = block_reduce_absmax(x, 2)
    assert out[0, 0, 0] == -5.0  # signed value of the abs-max element
    assert out[1, 1, 1] == 2.0


def test_resample_doubles_resolution():
    x = np.zeros((4, 8, 8), np.float32)
    out = resample_volume(x, orig_spacing=(2.0, 1.0, 1.0), new_spacing=(1.0, 1.0, 1.0))
    assert out.shape == (8, 8, 8)


def test_clip_pad_normalize_shapes():
    # small volume gets centre-padded in y/x, front-padded in z
    x = np.full((100, 400, 380), 500.0, np.float32)
    out = clip_pad_normalize(x)
    assert out.shape == (128, 512, 512)
    assert out.min() == -1.0  # pad value -1024/1024
    np.testing.assert_allclose(out.max(), 500 / 1024, rtol=1e-6)
    # oversize volume gets cropped (z keeps the LAST 128 slices)
    x2 = np.zeros((150, 600, 600), np.float32)
    x2[-1] = 2048.0
    out2 = clip_pad_normalize(x2)
    assert out2.shape == (128, 512, 512)
    assert out2[-1].max() == 2.0
    # HU clipping
    x3 = np.full((128, 512, 512), 9999.0, np.float32)
    assert clip_pad_normalize(x3).max() == 2.0


def test_pyramid_and_dataset_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vols = []
    for i in range(3):
        v = rng.normal(0, 500, size=(16, 64, 64)).astype(np.float32)
        p = tmp_path / f"vol{i}.npy"
        np.save(p, v)
        vols.append(str(p))

    # small pyramid on a raw array
    pyr = build_pyramid(rng.normal(size=(16, 16, 16)).astype(np.float32), num_levels=3)
    assert [p.shape for p in pyr] == [(16, 16, 16), (8, 8, 8), (4, 4, 4)]

    out = tmp_path / "dataset"
    create_dataset(vols, str(out), num_workers=1)
    # full-res dir is 512x512 with (128, 512, 512) volumes
    assert sorted(os.listdir(out / "512x512")) == ["0000.npy", "0001.npy", "0002.npy"]
    assert np.load(out / "4x4" / "0000.npy").shape == (1, 4, 4)
    # resolutions form the expected ladder
    dirs = sorted(os.listdir(out), key=lambda d: int(d.split("x")[0]))
    assert dirs == ["4x4", "8x8", "16x16", "32x32", "64x64", "128x128", "256x256", "512x512"]


def test_hdf5_packing(tmp_path):
    d = tmp_path / "npys"
    d.mkdir()
    for i in range(3):
        np.save(d / f"{i}.npy", np.full((4, 4), i, np.float32))
    h5 = pack_npy_to_hdf5(str(d), str(tmp_path / "out.h5"))
    import h5py

    with h5py.File(h5) as f:
        assert f["volumes"].shape == (3, 4, 4)
        assert f["volumes"][2].max() == 2.0


def test_nrrd_reader(tmp_path):
    arr = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    # NRRD sizes fastest-first: (4, 3, 2)
    header = b"NRRD0004\ntype: short\ndimension: 3\nsizes: 4 3 2\nencoding: gzip\n\n"
    payload = gzip.compress(arr.tobytes())
    path = tmp_path / "test.nrrd"
    path.write_bytes(header + payload)
    out, hdr = read_nrrd(str(path))
    np.testing.assert_array_equal(out, arr)
    assert hdr["type"] == "short"


def test_dicom_gated():
    from saragan_tpu.tools.prepare_data import read_dicom_series

    with pytest.raises(ImportError, match="SimpleITK or pydicom"):
        read_dicom_series("/nonexistent")
