"""Optional native (C++) npy loader binding.

The runtime/ directory builds `libsaragan_io.so` — a small C++ library that
mmaps .npy files and decodes headers without Python overhead, with a
multi-threaded batch loader.  We bind it via ctypes (no pybind11 in this
environment).  When the library hasn't been built, everything falls back to
numpy transparently.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_DTYPES = {
    1: np.float32,
    2: np.float64,
    3: np.int16,
    4: np.int32,
    5: np.int64,
    6: np.uint8,
    7: np.float16,
}


def _bf16() -> np.dtype:
    """ml_dtypes' bfloat16 as a numpy dtype (ml_dtypes ships with jax)."""
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "runtime", "build", "libsaragan_io.so"),
        os.path.join(here, "runtime", "libsaragan_io.so"),
    ):
        if os.path.isfile(cand):
            return cand
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.saragan_npy_probe.restype = ctypes.c_int
        lib.saragan_npy_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),  # shape out (max 8)
            ctypes.POINTER(ctypes.c_int),  # ndim out
            ctypes.POINTER(ctypes.c_int),  # dtype code out
        ]
        lib.saragan_npy_read.restype = ctypes.c_int
        lib.saragan_npy_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
        lib.saragan_npy_read_batch.restype = ctypes.c_int
        lib.saragan_npy_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        if hasattr(lib, "saragan_pf_create"):  # prefetcher (round-2 builds)
            lib.saragan_pf_create.restype = ctypes.c_void_p
            lib.saragan_pf_create.argtypes = [ctypes.c_int64, ctypes.c_int]
            lib.saragan_pf_submit.restype = ctypes.c_int
            lib.saragan_pf_submit.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ]
            lib.saragan_pf_next.restype = ctypes.c_int
            lib.saragan_pf_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_int64]
            lib.saragan_pf_destroy.restype = None
            lib.saragan_pf_destroy.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "saragan_pf_submit_t"):  # f16 output (round-3 builds)
            lib.saragan_pf_submit_t.restype = ctypes.c_int
            lib.saragan_pf_submit_t.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ]
        if hasattr(lib, "saragan_pf_submit_d"):  # dtype-coded output (0=f32,
            lib.saragan_pf_submit_d.restype = ctypes.c_int  # 1=f16, 2=bf16)
            lib.saragan_pf_submit_d.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def load_npy(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np.load(path)
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int()
    dtype_code = ctypes.c_int()
    rc = lib.saragan_npy_probe(path.encode(), shape, ctypes.byref(ndim), ctypes.byref(dtype_code))
    if rc != 0 or dtype_code.value not in _DTYPES:
        return np.load(path)
    shp = tuple(shape[i] for i in range(ndim.value))
    out = np.empty(shp, dtype=_DTYPES[dtype_code.value])
    rc = lib.saragan_npy_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
    if rc != 0:
        return np.load(path)
    return out


def load_npy_batch(paths, out: np.ndarray, num_threads: int = 4) -> bool:
    """Fill a preallocated (N, ...) float32 array from N same-shape npy files
    using the C++ multithreaded reader. Returns False on any mismatch."""
    lib = _load()
    if lib is None:
        return False
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    per_item = out.nbytes // out.shape[0]
    rc = lib.saragan_npy_read_batch(
        arr, len(paths), out.ctypes.data_as(ctypes.c_void_p), per_item, num_threads
    )
    return rc == 0


class NativeBatchPrefetcher:
    """Native prefetch executor: a C++ worker pool keeps `depth` batch jobs
    in flight (mmap decode + affine (x-mean)/std entirely off the GIL),
    consumed in submit order.  The deterministic shuffle/shard path
    selection stays in Python (`make_paths()` -> list of .npy paths per
    batch — cheap), matching NumpyPathDataset's exactly-once semantics.

    Duck-types the Python `Prefetcher` (next() / stop()).  Construct via
    `make_native_prefetcher`, which returns None when the library is absent
    so callers can fall back to the Python thread."""

    def __init__(self, make_paths, item_shape, mean, stddev,
                 depth: int = 3, workers: int = 4, out_dtype=np.float32):
        lib = _load()
        assert lib is not None and hasattr(lib, "saragan_pf_create")
        out_dtype = np.dtype(out_dtype)
        assert out_dtype in (np.float32, np.float16, _bf16()), out_dtype
        if out_dtype == np.float16 and not hasattr(lib, "saragan_pf_submit_t"):
            # pre-f16 library build: fall back to f32 output (the trainer
            # then casts, as before)
            out_dtype = np.dtype(np.float32)
        if out_dtype == _bf16() and not hasattr(lib, "saragan_pf_submit_d"):
            # pre-bf16 library build: fall back to f32 output (the trainer
            # then casts — same numerics, extra host copy)
            out_dtype = np.dtype(np.float32)
        self._lib = lib
        self._make_paths = make_paths
        self._item_shape = tuple(int(s) for s in item_shape)
        self._bytes_per_item = int(np.prod(self._item_shape)) * 4
        self._out_dtype = out_dtype
        self._normalize = mean is not None or stddev is not None
        self._mean = float(mean if mean is not None else 0.0)
        self._std = float(stddev if stddev is not None else 1.0)
        self._handle = ctypes.c_void_p(
            lib.saragan_pf_create(self._bytes_per_item, workers))
        assert self._handle
        self._inflight = []  # batch sizes, FIFO
        for _ in range(depth):
            self._submit()

    def _submit(self):
        paths = list(self._make_paths())
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        if self._out_dtype == _bf16():
            # normalized batches stored/shipped at half width, bit-exact
            # under bfloat16 compute (RNE on the worker pool == the step's
            # on-device cast)
            rc = self._lib.saragan_pf_submit_d(
                self._handle, arr, len(paths),
                self._mean, self._std, int(self._normalize), 2)
        elif self._out_dtype == np.float16:
            # normalized batches stored/shipped at half width: the f32->f16
            # cast runs on the C++ worker pool, and the consumer copy (and
            # any host->device transfer after it) halves
            rc = self._lib.saragan_pf_submit_t(
                self._handle, arr, len(paths),
                self._mean, self._std, int(self._normalize), 1)
        else:
            rc = self._lib.saragan_pf_submit(
                self._handle, arr, len(paths),
                self._mean, self._std, int(self._normalize))
        assert rc == 0, f"saragan_pf_submit rc={rc}"
        self._inflight.append(len(paths))

    def __next__(self) -> np.ndarray:
        if self._handle is None:
            raise StopIteration
        n = self._inflight.pop(0)
        out = np.empty((n,) + self._item_shape, self._out_dtype)
        rc = self._lib.saragan_pf_next(
            self._handle, out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
        if rc != 0:
            self.stop()
            raise RuntimeError(f"native prefetch failed (rc={rc})")
        self._submit()
        return out

    def stop(self):
        if self._handle is not None:
            self._lib.saragan_pf_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.stop()
        except Exception:
            pass


def make_native_prefetcher(make_paths, item_shape, mean, stddev,
                           depth: int = 3, workers: int = 4,
                           out_dtype=np.float32):
    """NativeBatchPrefetcher when the library (with pf symbols) is built,
    else None."""
    lib = _load()
    if lib is None or not hasattr(lib, "saragan_pf_create"):
        return None
    try:
        return NativeBatchPrefetcher(make_paths, item_shape, mean, stddev,
                                     depth=depth, workers=workers,
                                     out_dtype=out_dtype)
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Native JPEG decode (2D pipeline) — runtime/saragan_jpeg.cc
# ---------------------------------------------------------------------------


def have_jpeg() -> bool:
    """True when the library was built against libjpeg."""
    lib = _load()
    if lib is None or not hasattr(lib, "saragan_have_jpeg"):
        return False
    lib.saragan_have_jpeg.restype = ctypes.c_int
    return bool(lib.saragan_have_jpeg())


def decode_jpeg_batch(paths, size: int, channels: int = 3,
                      num_threads: int = 4) -> Optional[np.ndarray]:
    """Decode+resize a JPEG batch natively -> (n, channels, size, size)
    float32 in [-1, 1] (the 2D pipeline contract, imagenet._decode_resize;
    resize is the PIL antialiased-triangle filter reimplemented in C++).
    None when the native path is unavailable or any file fails — callers
    fall back to PIL."""
    lib = _load()
    if lib is None or not hasattr(lib, "saragan_jpeg_batch") or not have_jpeg():
        return None
    lib.saragan_jpeg_batch.restype = ctypes.c_int
    lib.saragan_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    n = len(paths)
    out = np.empty((n, channels, size, size), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.saragan_jpeg_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, channels, num_threads,
    )
    if rc != 0:
        return None
    return out
