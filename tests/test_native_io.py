"""Native C++ npy loader tests (skipped when runtime/ isn't built)."""

import os
import subprocess

import numpy as np
import pytest

from saragan_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libsaragan_io.so not built (run make in runtime/)"
)


@pytest.fixture
def volumes(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    arrays = []
    for i, dtype in enumerate([np.float32, np.int16, np.float64, np.uint8]):
        a = (rng.normal(0, 100, size=(4, 8, 8))).astype(dtype)
        p = str(tmp_path / f"v{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    return paths, arrays


def test_probe_and_read(volumes):
    paths, arrays = volumes
    for p, a in zip(paths, arrays):
        out = native.load_npy(p)
        assert out.shape == a.shape and out.dtype == a.dtype
        np.testing.assert_array_equal(out, a)


def test_read_batch_converts_to_f32(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    arrays = []
    for i in range(6):
        a = rng.integers(-1024, 3072, size=(4, 8, 8)).astype(np.int16)
        p = str(tmp_path / f"ct{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    out = np.empty((6, 4, 8, 8), np.float32)
    ok = native.load_npy_batch(paths, out, num_threads=3)
    assert ok
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(out[i], a.astype(np.float32))


def test_read_batch_shape_mismatch(tmp_path):
    np.save(tmp_path / "a.npy", np.zeros((2, 2), np.float32))
    out = np.empty((1, 3, 3), np.float32)
    assert not native.load_npy_batch([str(tmp_path / "a.npy")], out)


def test_dataset_uses_native(tmp_path):
    from saragan_tpu.data import NumpyPathDataset

    d = tmp_path / "4x4"
    d.mkdir()
    for i in range(4):
        np.save(d / f"{i}.npy", np.full((4, 4, 4), i, np.int16))
    ds = NumpyPathDataset(str(d))
    b = ds.batch(2)
    assert b.dtype == np.float32 and b.shape == (2, 1, 4, 4, 4)


def test_negative_shape_header_rejected(tmp_path):
    """Corrupt npy header with a negative dim must fail the native probe
    (fallback to numpy's own error), not wrap data_bytes."""
    from saragan_tpu.data import native

    import ctypes

    if not native.available():
        pytest.skip("native lib not built")
    p = tmp_path / "bad.npy"
    magic = b"\x93NUMPY\x01\x00"
    header = b"{'descr': '<f4', 'fortran_order': False, 'shape': (-1, 4), }"
    pad = 64 - (len(magic) + 2 + len(header) + 1) % 64
    header = header + b" " * pad + b"\n"
    p.write_bytes(magic + len(header).to_bytes(2, "little") + header + b"\x00" * 64)
    lib = native._load()
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int()
    dtype_code = ctypes.c_int()
    rc = lib.saragan_npy_probe(str(p).encode(), shape, ctypes.byref(ndim),
                               ctypes.byref(dtype_code))
    assert rc != 0  # native parser refuses; load_npy falls back to np.load
