"""Offline data preparation — rebuild of reference data_scripts/ (SURVEY C27).

LIDC-IDRI CT pipeline (reference data_scripts/process_lidc_idri_data.py):
DICOM series -> resample to (1, 1, 3)mm spacing -> clip HU to
[-1024, 2048] -> pad/crop to (128, 512, 512) -> divide by 1024 ->
Lanczos-3 block-reduce pyramid {512, 256, ..., 4} -> per-resolution
`{S}x{S}/NNNN.npy` files (+ optional HDF5 packing,
reference SURFGAN_3D/scripts/convert_npy_to_hdf5.py).

Environment gating: SimpleITK/pydicom are not in this image, so DICOM
ingestion is optional (`read_dicom_series` raises with instructions when
neither is importable); every other stage is pure numpy/scipy and fully
usable on .npy/.nrrd inputs.  A minimal NRRD reader replaces the reference's
nrrd dependency (convert_nrrd_to_numpy_pgan.py).
"""

from __future__ import annotations

import glob
import gzip
import os
from multiprocessing import Pool
from typing import Iterable, List, Optional, Tuple

import numpy as np

PAD_VALUE = -1024
CLIP_MAX = 2048
TARGET_SHAPE = (128, 512, 512)


# ---------------------------------------------------------------------------
# Lanczos / block-reduce downsampling (reference :124-137 + block_reduce)
# ---------------------------------------------------------------------------


def _lanczos_window(x, a):
    return np.sinc(x) * np.sinc(x / a)


def lanczos_3d_filter(k: int, a: int = 4) -> np.ndarray:
    """Normalized k^3 Lanczos-a filter (reference lanczos_3d :124-137)."""
    d = k / 2
    ds = np.arange(-d + 0.5, d - 0.5 + 1)
    f1 = _lanczos_window(ds * (a / d), a)
    f = f1[:, None, None] * f1[None, :, None] * f1[None, None, :]
    return f / f.sum()


def _view_blocks(x: np.ndarray, k: int) -> np.ndarray:
    """(D, H, W) -> (D/k, H/k, W/k, k, k, k) block view."""
    D, H, W = x.shape
    assert D % k == 0 and H % k == 0 and W % k == 0, (x.shape, k)
    return x.reshape(D // k, k, H // k, k, W // k, k).transpose(0, 2, 4, 1, 3, 5)


def block_reduce_lanczos(x: np.ndarray, k: int, a: int = 4) -> np.ndarray:
    """Lanczos-filtered k^3 block downsampling."""
    if k == 1:
        return x
    f = lanczos_3d_filter(k, a)
    return (_view_blocks(x, k) * f).sum(axis=(3, 4, 5))


def block_reduce_mean(x: np.ndarray, k: int) -> np.ndarray:
    if k == 1:
        return x
    return _view_blocks(x, k).mean(axis=(3, 4, 5))


def block_reduce_absmax(x: np.ndarray, k: int) -> np.ndarray:
    """Signed absolute-max pooling (reference convert_to_numpy absmax mode)."""
    if k == 1:
        return x
    blocks = _view_blocks(x, k)
    flat = blocks.reshape(blocks.shape[:3] + (-1,))
    idx = np.abs(flat).argmax(axis=-1)
    return np.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]


# ---------------------------------------------------------------------------
# Resampling (pure-numpy replacement for sitk Resample, reference :48-118)
# ---------------------------------------------------------------------------


def resample_volume(
    array: np.ndarray,
    orig_spacing: Tuple[float, float, float],
    new_spacing: Tuple[float, float, float] = (3.0, 1.0, 1.0),
    fill_value: float = PAD_VALUE,
) -> np.ndarray:
    """Linear resampling of a (D, H, W) volume to new voxel spacing.

    Spacings are (z, y, x) to match the array layout (the reference's sitk
    call uses (x, y, z) = (1, 1, 3); this is its array-order equivalent).
    """
    from scipy.ndimage import zoom

    factors = [o / n for o, n in zip(orig_spacing, new_spacing)]
    return zoom(array.astype(np.float32), factors, order=1, mode="constant", cval=fill_value)


def clip_pad_normalize(array: np.ndarray) -> np.ndarray:
    """Clip HU, pad/crop to (128, 512, 512), divide by 1024
    (reference :178-196)."""
    array = np.clip(array, PAD_VALUE, CLIP_MAX)
    z, y, x = array.shape

    def pads(total, cur):
        p = (total - cur) / 2
        return int(np.floor(p)), int(np.ceil(p))

    # center-pad / center-crop y and x to 512
    if y < 512:
        array = np.pad(array, [(0, 0), pads(512, y), (0, 0)], constant_values=PAD_VALUE)
    elif y > 512:
        lo = (y - 512) // 2
        array = array[:, lo : lo + 512]
    if x < 512:
        array = np.pad(array, [(0, 0), (0, 0), pads(512, x)], constant_values=PAD_VALUE)
    elif x > 512:
        lo = (x - 512) // 2
        array = array[:, :, lo : lo + 512]

    # z: keep the LAST 128 slices, pad at the front (reference :188-191)
    if array.shape[0] > 128:
        array = array[array.shape[0] - 128 :]
    elif array.shape[0] < 128:
        array = np.pad(array, [(128 - array.shape[0], 0), (0, 0), (0, 0)],
                       constant_values=PAD_VALUE)

    assert array.shape == TARGET_SHAPE, array.shape
    return array / abs(PAD_VALUE)


def build_pyramid(array: np.ndarray, num_levels: int = 8, method: str = "lanczos") -> List[np.ndarray]:
    """Full-res + 7 halvings (reference :199-204): level i reduces by 2^i."""
    reduce_fn = {
        "lanczos": block_reduce_lanczos,
        "average": block_reduce_mean,
        "absmax": block_reduce_absmax,
    }[method]
    out = [array]
    for i in range(1, num_levels):
        out.append(reduce_fn(array, 2**i))
    return out


# ---------------------------------------------------------------------------
# Input readers
# ---------------------------------------------------------------------------


def read_dicom_series(path: str) -> Tuple[np.ndarray, Tuple[float, float, float]]:
    """DICOM series -> ((D, H, W) HU array, (z, y, x) spacing).

    Requires SimpleITK or pydicom (not in this image); raises otherwise."""
    try:
        import SimpleITK as sitk  # noqa

        reader = sitk.ImageSeriesReader()
        reader.SetFileNames(reader.GetGDCMSeriesFileNames(path))
        image = reader.Execute()
        sx, sy, sz = image.GetSpacing()
        return sitk.GetArrayFromImage(image).astype(np.float32), (sz, sy, sx)
    except ImportError:
        pass
    try:
        import pydicom

        files = sorted(glob.glob(os.path.join(path, "*.dcm")))
        slices = [pydicom.dcmread(f) for f in files]
        slices.sort(key=lambda s: float(s.ImagePositionPatient[2]))
        arr = np.stack([s.pixel_array * float(s.RescaleSlope) + float(s.RescaleIntercept)
                        for s in slices]).astype(np.float32)
        dz = abs(float(slices[1].ImagePositionPatient[2]) - float(slices[0].ImagePositionPatient[2]))
        dy, dx = (float(v) for v in slices[0].PixelSpacing)
        return arr, (dz, dy, dx)
    except ImportError:
        raise ImportError(
            "DICOM ingestion needs SimpleITK or pydicom (neither is in this image). "
            "Convert series to .npy/.nrrd offline, or install one of them."
        )


def read_nrrd(path: str) -> Tuple[np.ndarray, dict]:
    """Minimal NRRD reader (raw/gzip little-endian) — replaces the `nrrd`
    dependency of reference convert_nrrd_to_numpy_pgan.py."""
    with open(path, "rb") as f:
        header = {}
        magic = f.readline()
        assert magic.startswith(b"NRRD"), "not a NRRD file"
        while True:
            line = f.readline()
            if line in (b"\n", b"\r\n", b""):
                break
            line = line.decode("ascii", "ignore").strip()
            if line.startswith("#") or ":" not in line:
                continue
            key, _, value = line.partition(":")
            header[key.strip()] = value.lstrip("=").strip()
        payload = f.read()

    dtype_map = {
        "float": np.float32, "double": np.float64, "short": np.int16,
        "signed short": np.int16, "unsigned short": np.uint16,
        "int": np.int32, "uchar": np.uint8, "unsigned char": np.uint8,
    }
    dtype = dtype_map[header["type"]]
    sizes = [int(s) for s in header["sizes"].split()]
    enc = header.get("encoding", "raw")
    if enc in ("gzip", "gz"):
        payload = gzip.decompress(payload)
    elif enc != "raw":
        raise NotImplementedError(f"NRRD encoding {enc}")
    arr = np.frombuffer(payload, dtype=dtype)
    # NRRD sizes are fastest-first; numpy shape is slowest-first
    return arr.reshape(sizes[::-1]), header


# ---------------------------------------------------------------------------
# Dataset creation (reference create_lidc_idri_dataset.py + Pool fan-out)
# ---------------------------------------------------------------------------


def process_volume(array: np.ndarray, orig_spacing=None, method: str = "lanczos"):
    """One volume through resample -> clip/pad/normalize -> pyramid."""
    if orig_spacing is not None:
        array = resample_volume(array, orig_spacing)
    array = clip_pad_normalize(array)
    return build_pyramid(array, method=method)


def _level_dir(out_dir: str, level_shape: Tuple[int, int, int]) -> str:
    s = level_shape[-1]
    return os.path.join(out_dir, f"{s}x{s}")


def write_pyramid(pyramid: List[np.ndarray], out_dir: str, index: int):
    for level in pyramid:
        d = _level_dir(out_dir, level.shape)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, f"{index:04d}.npy"), level.astype(np.float32))


def _process_one(task):
    index, path, out_dir, method = task
    if os.path.isdir(path):
        array, spacing = read_dicom_series(path)
    elif path.endswith(".nrrd"):
        array, _ = read_nrrd(path)
        spacing = None
    else:
        array = np.load(path)
        spacing = None
    pyramid = process_volume(array, spacing, method)
    write_pyramid(pyramid, out_dir, index)
    return index


def create_dataset(
    inputs: Iterable[str],
    out_dir: str,
    method: str = "lanczos",
    num_workers: int = 1,
) -> List[int]:
    """Fan out volume processing over a Pool (reference uses
    multiprocessing.Pool the same way)."""
    tasks = [(i, p, out_dir, method) for i, p in enumerate(sorted(inputs))]
    if num_workers <= 1:
        return [_process_one(t) for t in tasks]
    with Pool(num_workers) as pool:
        return pool.map(_process_one, tasks)


def pack_npy_to_hdf5(npy_dir: str, h5_path: str, dataset_name: str = "volumes"):
    """npy dir -> one HDF5 file (reference scripts/convert_npy_to_hdf5.py)."""
    import h5py

    files = sorted(glob.glob(os.path.join(npy_dir, "*.npy")))
    assert files, npy_dir
    first = np.load(files[0])
    with h5py.File(h5_path, "w") as f:
        ds = f.create_dataset(dataset_name, shape=(len(files), *first.shape), dtype=first.dtype)
        for i, p in enumerate(files):
            ds[i] = np.load(p)
    return h5_path
