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


def test_prefetcher_bf16_output_bit_exact(tmp_path):
    """--transfer_dtype bfloat16 path (the auto default under bfloat16
    compute): the executor's f32->bf16 conversion must be bit-exact vs
    ml_dtypes' round-to-nearest-even cast — this is what makes bf16 transfer
    numerics-identical to shipping f32 (the step's first op performs the
    same cast on device, train/step.py)."""
    import ml_dtypes

    if not hasattr(native._load(), "saragan_pf_submit_d"):
        pytest.skip("library built without dtype-coded prefetch support")
    rng = np.random.default_rng(0)
    special = np.array(
        [0.0, -0.0, np.inf, -np.inf, np.nan, 3.3895314e38, -3.3895314e38,
         np.float32(2**-126), 1.0039062, 1.0117188,  # RNE tie cases
         3.4e38, -3.4e38, 1e-40, -1e-40], np.float32)
    vals = np.concatenate([
        special,
        rng.normal(0, 10, 4096).astype(np.float32),
        (rng.normal(size=1024) * 10.0 ** rng.integers(-30, 30, 1024)
         ).astype(np.float32),
    ])
    p = str(tmp_path / "a.npy")
    np.save(p, vals)
    n = len(vals)
    bf16 = np.dtype(ml_dtypes.bfloat16)

    for mean, std in ((None, None), (1.5, 2.0)):
        pf = native.NativeBatchPrefetcher(
            lambda: [p], (n,), mean, std, depth=1, out_dtype=bf16)
        got = next(pf)
        pf.stop()
        assert got.dtype == bf16
        src = vals if mean is None else (vals - mean) / std
        want = src.astype(bf16)[None]
        gb, wb = got.view(np.uint16), want.view(np.uint16)
        nan_both = (np.isnan(got.astype(np.float32))
                    & np.isnan(want.astype(np.float32)))
        np.testing.assert_array_equal(np.where(nan_both, 0, gb),
                                      np.where(nan_both, 0, wb))


def test_prefetcher_bf16_falls_back_on_old_library(tmp_path, monkeypatch):
    """A library built before saragan_pf_submit_d existed must degrade to
    f32 output (the trainer then casts host-side) instead of crashing."""
    import ml_dtypes

    lib = native._load()
    if lib is None:
        pytest.skip("native library not built")
    p = str(tmp_path / "a.npy")
    np.save(p, np.arange(8, dtype=np.float32))

    class OldLib:
        def __getattr__(self, name):  # hasattr(...,"saragan_pf_submit_d") -> False
            if name == "saragan_pf_submit_d":
                raise AttributeError(name)
            return getattr(lib, name)

    old = OldLib()
    monkeypatch.setattr(native, "_load", lambda: old)
    pf = native.NativeBatchPrefetcher(
        lambda: [p], (8,), None, None, depth=1,
        out_dtype=np.dtype(ml_dtypes.bfloat16))
    got = next(pf)
    pf.stop()
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got[0], np.arange(8, dtype=np.float32))


# ---------------------------------------------------------------------------
# Native JPEG decode (runtime/saragan_jpeg.cc)
# ---------------------------------------------------------------------------


def _jpeg_fixture(tmp_path, n=3):
    from PIL import Image

    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 64), np.linspace(-1, 1, 64), indexing="ij")
    paths = []
    for i in range(n):
        g = (127 * (1 + np.sin((2 + i) * yy) * np.cos((1 + i) * xx))).astype(np.uint8)
        if i == n - 1:
            g = rng.integers(0, 255, size=(64, 64), dtype=np.uint8)
        p = str(tmp_path / f"img_{i}.jpg")
        Image.fromarray(np.stack([g] * 3, -1)).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_jpeg_matches_pil(tmp_path):
    from saragan_tpu.data import native
    from saragan_tpu.data.imagenet import _decode_resize

    if not native.have_jpeg():
        pytest.skip("library built without libjpeg")
    paths = _jpeg_fixture(tmp_path)
    # same-size decode is bit-exact (both stacks are libjpeg)
    nat = native.decode_jpeg_batch(paths, 64, 3)
    pil = np.stack([_decode_resize(p, 64, 3) for p in paths])
    np.testing.assert_array_equal(nat, pil)
    # resize: the C++ PIL-style antialiased triangle filter in float vs
    # PIL's uint8 fixed point — within one 8-bit LSB of [-1, 1]
    for size, channels in ((32, 3), (16, 3), (32, 1)):
        nat = native.decode_jpeg_batch(paths, size, channels)
        pil = np.stack([_decode_resize(p, size, channels) for p in paths])
        assert nat.shape == pil.shape == (len(paths), channels, size, size)
        assert np.abs(nat - pil).max() < 1.5 / 127.5, (size, channels)


def test_native_jpeg_rejects_non_jpeg(tmp_path):
    from PIL import Image

    from saragan_tpu.data import native

    if not native.have_jpeg():
        pytest.skip("library built without libjpeg")
    p = str(tmp_path / "img.png")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
    assert native.decode_jpeg_batch([p], 8, 3) is None


def test_pipeline_uses_native_and_falls_back(tmp_path, monkeypatch):
    """ImagePipeline: native batches equal the PIL batches on JPEGs, and a
    non-JPEG file flips the pipeline to the PIL path without failing."""
    from PIL import Image

    from saragan_tpu.data import native
    from saragan_tpu.data.imagenet import ImagePipeline

    if not native.have_jpeg():
        pytest.skip("library built without libjpeg")
    paths = _jpeg_fixture(tmp_path)
    labels = list(range(len(paths)))

    pipe_nat = ImagePipeline(paths, labels, size=16, batch_size=3, seed=5)
    assert pipe_nat._native is not None
    b_nat, l_nat = pipe_nat.next_batch()

    monkeypatch.setenv("SARAGAN_NATIVE_JPEG", "0")
    pipe_pil = ImagePipeline(paths, labels, size=16, batch_size=3, seed=5)
    assert pipe_pil._native is None
    b_pil, l_pil = pipe_pil.next_batch()
    np.testing.assert_array_equal(l_nat, l_pil)
    assert np.abs(b_nat - b_pil).max() < 1.5 / 127.5
    monkeypatch.delenv("SARAGAN_NATIVE_JPEG")

    # fallback: a PNG in the shard disables native mid-stream, batch still ok
    png = str(tmp_path / "odd.png")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(png)
    pipe_mix = ImagePipeline(paths + [png], labels + [3], size=16, batch_size=4, seed=5)
    assert pipe_mix._native is not None
    b, l = pipe_mix.next_batch()
    assert b.shape == (4, 3, 16, 16) and np.isfinite(b).all()
    assert pipe_mix._native is None
