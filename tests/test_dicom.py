"""Pure-Python DICOM reader (saragan_tpu.tools.dicom) — round-trip oracles.

The reference ingests LIDC-IDRI DICOM via SimpleITK
(data_scripts/process_lidc_idri_data.py:48-119); this reader replaces that
dependency for uncompressed little-endian CT.  Every test writes files with
the module's own minimal writer and checks the reader recovers exactly what
was written (HU values, geometry, ordering)."""

import os
import struct

import numpy as np
import pytest

from saragan_tpu.tools import dicom
from saragan_tpu.tools.dicom import DicomError, read_file, read_series, write_ct_slice


def _make_series(tmpdir, n=4, explicit=True, shuffle_names=False, **kw):
    rng = np.random.default_rng(0)
    vols = []
    for i in range(n):
        px = rng.integers(0, 3000, size=(8, 10), dtype=np.int64).astype(np.uint16)
        vols.append(px)
        # shuffled file names must NOT determine the stacking order
        name = f"{'zyx'[i % 3]}{n - i:02d}.dcm" if shuffle_names else f"s{i:02d}.dcm"
        write_ct_slice(
            os.path.join(tmpdir, name), px,
            instance_number=i + 1, z_position=2.5 * i,
            pixel_spacing=(0.703125, 0.703125), slice_thickness=2.5,
            explicit=explicit, **kw,
        )
    return np.stack(vols)


@pytest.mark.parametrize("explicit", [True, False], ids=["explicitVR", "implicitVR"])
def test_series_round_trip(tmp_path, explicit):
    stored = _make_series(str(tmp_path), n=5, explicit=explicit, shuffle_names=True)
    vol, spacing = read_series(str(tmp_path))
    # default slope 1 / intercept -1024 (CT convention)
    np.testing.assert_allclose(vol, stored.astype(np.float32) - 1024.0)
    assert vol.dtype == np.float32 and vol.shape == (5, 8, 10)
    assert spacing == (2.5, 0.703125, 0.703125)


def test_rescale_slope_intercept(tmp_path):
    px = np.arange(20, dtype=np.int16).reshape(4, 5)
    write_ct_slice(str(tmp_path / "a.dcm"), px, rescale_slope=2.0, rescale_intercept=-100.0)
    vol, _ = read_series(str(tmp_path))
    np.testing.assert_allclose(vol[0], px.astype(np.float32) * 2.0 - 100.0)


def test_signed_pixel_representation(tmp_path):
    px = np.array([[-1024, -1, 0, 1, 2047]], dtype=np.int16)
    write_ct_slice(str(tmp_path / "a.dcm"), px, rescale_slope=1.0, rescale_intercept=0.0)
    s = read_file(str(tmp_path / "a.dcm"))
    np.testing.assert_array_equal(s.pixel_array(), px)
    np.testing.assert_allclose(s.hounsfield(), px.astype(np.float32))


@pytest.mark.parametrize("explicit", [True, False], ids=["explicitVR", "implicitVR"])
def test_undefined_length_sequence_is_skipped(tmp_path, explicit):
    """An undefined-length SQ with a nested item before PixelData must not
    desynchronize the element walk (PS3.5 §7.5 delimiters)."""
    px = np.full((3, 3), 7, dtype=np.uint16)
    write_ct_slice(str(tmp_path / "a.dcm"), px, explicit=explicit, extra_sequence=True)
    s = read_file(str(tmp_path / "a.dcm"))
    np.testing.assert_array_equal(s.pixel_array(), px)
    assert s.modality == "CT"


@pytest.mark.parametrize("explicit", [True, False], ids=["explicitVR", "implicitVR"])
def test_un_sequence_contents_are_implicit_vr(tmp_path, explicit):
    """PS3.5 §6.2.2 (CP-246): an undefined-length UN element's contents are
    Implicit VR even inside an Explicit VR dataset.  Anonymizers commonly
    rewrite private sequences as UN, so a reader that walks them with the
    file's VR mode desynchronizes and rejects valid series."""
    px = np.full((3, 3), 5, dtype=np.uint16)
    write_ct_slice(str(tmp_path / "a.dcm"), px, explicit=explicit,
                   extra_sequence=True, sequence_vr=b"UN", undefined_item=True)
    s = read_file(str(tmp_path / "a.dcm"))
    np.testing.assert_array_equal(s.pixel_array(), px)
    assert s.modality == "CT"


def test_sort_falls_back_to_instance_number(tmp_path):
    """Slices WITHOUT ImagePositionPatient sort by InstanceNumber
    (reference pydicom path sorts by z; sitk uses position too).  The
    position tag is genuinely absent so the fallback branch runs — file
    names are shuffled against instance order to prove the sort did it."""
    for i, inst in enumerate([3, 1, 2]):
        px = np.full((2, 2), inst * 100, dtype=np.uint16)
        write_ct_slice(str(tmp_path / f"f{i}.dcm"), px, instance_number=inst,
                       include_position=False)
    vol, spacing = read_series(str(tmp_path))
    assert [int(v) for v in vol[:, 0, 0] + 1024] == [100, 200, 300]
    # no z positions at all -> SliceThickness fallback for dz
    assert spacing[0] == 1.0


def test_largest_series_wins(tmp_path):
    """Directory mixing two SeriesInstanceUIDs stacks only the larger one
    (sitk.ImageSeriesReader default behavior)."""
    for i in range(3):
        write_ct_slice(str(tmp_path / f"a{i}.dcm"), np.full((2, 2), i, np.uint16),
                       series_uid="1.2.3.4", instance_number=i + 1, z_position=float(i))
    write_ct_slice(str(tmp_path / "b0.dcm"), np.full((4, 4), 9, np.uint16),
                   series_uid="9.9.9.9", instance_number=1)
    vol, _ = read_series(str(tmp_path))
    assert vol.shape == (3, 2, 2)


def test_junk_file_in_series_is_skipped(tmp_path):
    """A corrupt .dcm alongside good slices must not abort series assembly
    (LIDC directories carry stray files); but a directory where NOTHING is
    readable surfaces the parse error."""
    _make_series(str(tmp_path), n=3)
    (tmp_path / "zz.dcm").write_bytes(b"\x00" * 200)  # unparseable
    vol, _ = read_series(str(tmp_path))
    assert vol.shape[0] == 3

    bad = tmp_path / "allbad"
    bad.mkdir()
    (bad / "x.dcm").write_bytes(b"\x00" * 200)
    with pytest.raises(DicomError):
        read_series(str(bad))


def test_partially_corrupt_series_warns(tmp_path):
    """A truncated slice amid good ones is skipped but NEVER silently: the
    volume would be anatomically discontinuous, so read_series warns with
    the drop count and first parse error."""
    _make_series(str(tmp_path), n=3)
    good = (tmp_path / "s00.dcm").read_bytes()
    (tmp_path / "trunc.dcm").write_bytes(good[: len(good) - 40])  # cut PixelData
    with pytest.warns(RuntimeWarning, match="1 unreadable"):
        vol, _ = read_series(str(tmp_path))
    assert vol.shape[0] == 3


def test_compressed_transfer_syntax_rejected(tmp_path):
    p = str(tmp_path / "a.dcm")
    write_ct_slice(p, np.zeros((2, 2), np.uint16))
    data = open(p, "rb").read()
    # splice in the RLE (compressed) transfer syntax UID — same padded length
    rle = b"1.2.840.10008.1.2.5\x00"
    old = dicom.EXPLICIT_VR_LE.encode() + b"\x00"  # written padded to even
    assert old in data and len(rle) == len(old)
    open(p, "wb").write(data.replace(old, rle))
    with pytest.raises(DicomError, match="compressed"):
        read_file(p)


def test_encapsulated_pixel_data_rejected(tmp_path):
    """Undefined-length PixelData (encapsulated) raises even if the meta
    group lies about the syntax."""
    p = str(tmp_path / "a.dcm")
    write_ct_slice(p, np.zeros((2, 2), np.uint16))
    data = bytearray(open(p, "rb").read())
    # rewrite the PixelData header length to undefined
    idx = data.rfind(struct.pack("<HH", 0x7FE0, 0x0010))
    assert idx > 0
    data[idx + 8:idx + 12] = struct.pack("<I", 0xFFFFFFFF)
    open(p, "wb").write(bytes(data))
    with pytest.raises(DicomError, match="encapsulated"):
        read_file(p)


def test_bare_dataset_without_preamble(tmp_path):
    """Datasets missing the part-10 preamble are auto-detected (both VR
    modes) — some archives strip the 132-byte header."""
    for explicit in (True, False):
        p = str(tmp_path / f"x{int(explicit)}.dcm")
        write_ct_slice(p, np.full((2, 3), 42, np.uint16), explicit=explicit)
        data = open(p, "rb").read()
        # find start of dataset: meta ends where the body begins; re-parse
        # via read_file to locate by writing body-only through the writer's
        # internals is overkill — instead strip preamble+DICM+meta by
        # scanning for the first body tag (0008,0060 Modality)
        idx = data.find(struct.pack("<HH", 0x0008, 0x0060))
        bare = str(tmp_path / f"bare{int(explicit)}.dcm")
        open(bare, "wb").write(data[idx:])
        s = read_file(bare)
        np.testing.assert_array_equal(s.pixel_array(), np.full((2, 3), 42, np.uint16))


def test_prepare_data_fallback_integration(tmp_path):
    """read_dicom_series reaches the built-in reader when sitk/pydicom are
    absent (they are, in this image) and feeds the existing resample/pyramid
    pipeline end-to-end."""
    from saragan_tpu.tools import prepare_data

    series_dir = tmp_path / "series"
    series_dir.mkdir()
    _make_series(str(series_dir), n=6, explicit=True)
    vol, spacing = prepare_data.read_dicom_series(str(series_dir))
    assert vol.shape == (6, 8, 10) and spacing == (2.5, 0.703125, 0.703125)
    resampled = prepare_data.resample_volume(vol, spacing, (3.0, 1.0, 1.0))
    assert resampled.ndim == 3 and np.isfinite(resampled).all()


def test_metadata_extraction_over_dicom(tmp_path):
    from saragan_tpu.tools import prepare_data

    series_dir = tmp_path / "case1"
    series_dir.mkdir()
    _make_series(str(series_dir), n=3)
    csv_path = str(tmp_path / "meta.csv")
    n = prepare_data.extract_metadata(str(tmp_path), csv_path)
    assert n >= 1 and os.path.exists(csv_path)
    text = open(csv_path).read()
    assert "case1" in text
