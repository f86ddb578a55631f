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


def test_native_prefetcher_parity_and_order(tmp_path):
    """The native prefetch executor must return batches in submit order,
    bit-equal to the numpy load + normalize_numpy path."""
    from saragan_tpu.data import native
    from saragan_tpu.data.normalize import normalize_numpy

    if not native.available():
        pytest.skip("native lib not built")
    files = []
    for i in range(8):
        p = tmp_path / f"v{i}.npy"
        np.save(p, (np.random.default_rng(i).normal(size=(2, 4, 4)) * 50).astype(np.int16))
        files.append(str(p))
    order = []

    seq = iter([files[0:4], files[4:8], files[2:6], files[1:5]])

    def make_paths():
        p = next(seq, files[0:4])
        order.append(p)
        return p

    pf = native.make_native_prefetcher(make_paths, (1, 2, 4, 4), 1.5, 0.5, depth=2)
    if pf is None:
        pytest.skip("prefetch symbols absent")
    try:
        for k in range(4):
            got = next(pf)
            exp = np.stack([np.load(p).astype(np.float32)[None] for p in order[k]])
            exp = normalize_numpy(exp, 1.5, 0.5).astype(np.float32)
            np.testing.assert_array_equal(got, exp)
    finally:
        pf.stop()


def test_trainer_uses_native_prefetcher_and_trains(tmp_path):
    """End-to-end: the trainer's native-prefetch path produces a working
    phase (same events/checkpoint as the Python thread path)."""
    from saragan_tpu.data import native

    if not native.available():
        pytest.skip("native lib not built")
    import json

    from saragan_tpu.config import Config
    from saragan_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    for size in (4,):
        d = tmp_path / "data" / f"{size}x{size}"
        d.mkdir(parents=True)
        for i in range(12):
            np.save(d / f"v{i}.npy", rng.normal(size=(size, size, size)).astype(np.float32))
    cfg = Config(
        architecture="pgan",
        dataset_path=str(tmp_path / "data"),
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 8, 8, 8)",
        starting_phase=1,
        ending_phase=1,
        latent_dim=8,
        network_size="xxs",
        base_batch_size=4,
        mixing_nimg=8,
        stabilizing_nimg=8,
        loss_fn="wgan",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
        data_mean=0.1,
        data_stddev=1.1,
        native_prefetch=True,
        logdir=str(tmp_path / "logs"),
    ).finalize()
    t = Trainer(cfg, verbose=True, prefetch=True)
    t.run()
    events = [json.loads(l) for l in open(tmp_path / "logs" / "events.jsonl")]
    assert any(e["tag"] == "Loss/d_loss" for e in events)


def test_prefetcher_f16_output_bit_exact(tmp_path):
    """--transfer_dtype float16 path: the executor's f32->f16 conversion
    (normalize included) must be bit-exact vs numpy's round-to-nearest-even
    cast, including signed zeros, inf/nan, the 65504/65520 overflow
    boundary, and half subnormals."""
    if not hasattr(native._load(), "saragan_pf_submit_t"):
        pytest.skip("library built without f16 prefetch support")
    rng = np.random.default_rng(0)
    special = np.array(
        [0.0, -0.0, np.inf, -np.inf, np.nan, 65504.0, 65520.0, 65519.9,
         2**-24, 2**-25, 2**-25 * 1.0001, 2**-26, 1e-8, -1e-8, 3.14159,
         -2.71828e4, 6.1e-5, 5.96e-8], np.float32)
    vals = np.concatenate([
        special,
        rng.normal(0, 10, 4096).astype(np.float32),
        rng.normal(0, 1e-6, 1024).astype(np.float32),
        rng.normal(0, 1e4, 1024).astype(np.float32),
    ])
    p = str(tmp_path / "a.npy")
    np.save(p, vals)
    n = len(vals)

    pf = native.NativeBatchPrefetcher(
        lambda: [p], (n,), None, None, depth=1, out_dtype=np.float16)
    got = next(pf)
    pf.stop()
    assert got.dtype == np.float16
    want = vals.astype(np.float16)[None]
    np.testing.assert_array_equal(got.view(np.uint16), want.view(np.uint16))

    # normalized variant
    pf = native.NativeBatchPrefetcher(
        lambda: [p], (n,), 1.5, 2.0, depth=1, out_dtype=np.float16)
    got = next(pf)
    pf.stop()
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore", RuntimeWarning)  # inf overflow in the cast
        want = ((vals - 1.5) / 2.0).astype(np.float16)[None]
    np.testing.assert_array_equal(got.view(np.uint16), want.view(np.uint16))
