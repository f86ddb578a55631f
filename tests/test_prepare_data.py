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


def test_dicom_builtin_fallback_reports_empty_dir(tmp_path):
    """With sitk/pydicom absent, read_dicom_series falls through to the
    built-in pure-Python reader (tools/dicom.py), which raises a clear
    DicomError on a directory with no readable slices."""
    from saragan_tpu.tools.dicom import DicomError
    from saragan_tpu.tools.prepare_data import read_dicom_series

    with pytest.raises(DicomError, match="no readable DICOM slices"):
        read_dicom_series(str(tmp_path))


# ---------------------------------------------------------------------------
# TFRecord codec + converters + metadata (round 2; reference
# data_scripts/{convert_to_numpy,convert_npy_pt,extract_metadata}.py)
# ---------------------------------------------------------------------------


def test_tfrecord_roundtrip(tmp_path):
    from saragan_tpu.tools.prepare_data import read_tfrecords, write_tfrecords

    vols = [np.random.default_rng(i).normal(size=(2, 4, 4)).astype(np.float32)
            for i in range(3)]
    path = tmp_path / "a.tfrecord"
    assert write_tfrecords(vols, str(path)) == 3
    back = read_tfrecords(str(path), shape=(2, 4, 4), verify_crc=True)
    assert len(back) == 3
    for a, b in zip(vols, back):
        np.testing.assert_array_equal(a, b)


def test_tfrecord_tensorflow_cross_parity(tmp_path):
    """Our pure-Python codec must interoperate bit-for-bit with TensorFlow's
    (the format the reference actually wrote, convert_to_numpy.py:8-35)."""
    tf = pytest.importorskip("tensorflow")

    vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)

    # ours -> tf
    from saragan_tpu.tools.prepare_data import (
        decode_float_example,
        read_tfrecords,
        write_tfrecords,
    )

    ours = tmp_path / "ours.tfrecord"
    write_tfrecords([vol], str(ours))
    ds = tf.data.TFRecordDataset(str(ours))
    feats = {"image": tf.io.FixedLenFeature((24,), tf.float32)}
    parsed = [tf.io.parse_single_example(r, feats)["image"].numpy() for r in ds]
    np.testing.assert_array_equal(parsed[0].reshape(2, 3, 4), vol)

    # tf -> ours
    theirs = tmp_path / "tf.tfrecord"
    ex = tf.train.Example(features=tf.train.Features(feature={
        "image": tf.train.Feature(float_list=tf.train.FloatList(value=vol.ravel()))
    }))
    with tf.io.TFRecordWriter(str(theirs)) as w:
        w.write(ex.SerializeToString())
    back = read_tfrecords(str(theirs), shape=(2, 3, 4), verify_crc=True)
    np.testing.assert_array_equal(back[0], vol)
    # and the raw proto parses too
    np.testing.assert_array_equal(
        decode_float_example(ex.SerializeToString()), vol.ravel())


def test_convert_tfrecords_to_npy(tmp_path):
    from saragan_tpu.tools.prepare_data import (
        convert_tfrecords_to_npy,
        write_tfrecords,
    )

    rec_dir = tmp_path / "recs"
    rec_dir.mkdir()
    vols = [np.full((2, 2, 2), i, np.float32) for i in range(4)]
    write_tfrecords(vols[:2], str(rec_dir / "a.tfrecord"))
    write_tfrecords(vols[2:], str(rec_dir / "b.tfrecord"))
    out = tmp_path / "npys"
    n = convert_tfrecords_to_npy(str(rec_dir), str(out), shape=(2, 2, 2))
    assert n == 4
    for i in range(4):
        np.testing.assert_array_equal(np.load(out / f"{i:04d}.npy"), vols[i])


def test_convert_npy_to_pt(tmp_path):
    import torch

    from saragan_tpu.tools.prepare_data import convert_npy_to_pt

    src = tmp_path / "npy" / "4x4"
    src.mkdir(parents=True)
    for i in range(2):
        np.save(src / f"{i:04d}.npy", np.full((4, 4, 4), i + 0.7, np.float32))
    n = convert_npy_to_pt(str(tmp_path / "npy"), str(tmp_path / "pt"), sizes=(4,))
    assert n == 2
    t = torch.load(tmp_path / "pt" / "4x4" / "0001.pt")
    assert t.dtype == torch.int16  # reference casts int16 (convert_npy_pt.py:28)
    assert int(t[0, 0, 0]) == 1


def test_extract_metadata_csv(tmp_path):
    import csv

    from saragan_tpu.tools.prepare_data import extract_metadata, volume_metadata

    for i in range(3):
        np.save(tmp_path / f"v{i}.npy", np.random.default_rng(i).normal(
            loc=i, size=(3, 4, 4)).astype(np.float32))
    out = tmp_path / "metadata.csv"
    n = extract_metadata(str(tmp_path), str(out))
    assert n == 3
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    # reference column set (extract_metadata.py:43-66)
    for col in ("path", "orig_depth", "orig_size", "orig_min", "orig_max",
                "orig_mean", "orig_std", "orig_median"):
        assert col in rows[0]
    assert int(rows[0]["orig_depth"]) == 3
    m = volume_metadata(np.zeros((2, 8, 8)), "x")
    assert m["orig_size"] == (8, 8, 2)  # sitk GetSize() is (x, y, z)
