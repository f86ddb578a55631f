"""TF TensorBundle interop (tools/tf_checkpoint.py) — format goldens,
snappy decoder, round-trips, and the migration path end-to-end.

No TensorFlow exists in this environment, so format correctness is pinned
against the public specification: the crc32c check value, the leveldb table
magic, hand-built snappy streams and block bytes — plus write->read
round-trips over the same codec."""

import os
import struct

import numpy as np
import pytest

from saragan_tpu.tools import tf_checkpoint as tfc


# ---------------------------------------------------------------- primitives


def test_crc32c_check_value():
    # the standard Castagnoli check value (RFC 3720 appendix / crc catalogs)
    assert tfc.crc32c(b"123456789") == 0xE3069283
    # the pure-Python fallback must agree with the native path
    assert tfc._crc32c_py(b"123456789") == 0xE3069283
    blob = bytes(range(256)) * 37
    assert tfc._crc32c_py(blob) == tfc.crc32c(blob)


def test_crc32c_masking_is_invertible_form():
    c = tfc.crc32c(b"some block")
    m = tfc.masked_crc32c(b"some block")
    unrot = (m - 0xA282EAD8) & 0xFFFFFFFF
    assert ((unrot >> 17) | (unrot << 15)) & 0xFFFFFFFF == c


@pytest.mark.parametrize("n", [0, 1, 127, 128, 300, 2**31, 2**40 + 17])
def test_varint_round_trip(n):
    buf = tfc._encode_varint(n)
    val, pos = tfc._decode_varint(buf, 0)
    assert val == n and pos == len(buf)


def test_snappy_literal_and_copy():
    # stream: uncompressed length 10, literal "abcde" (tag len-1=4 -> 0x10),
    # then copy len 5 offset 5 (2-byte offset form: tag (5-1)<<2|2 = 0x12)
    stream = bytes([10, (4 << 2) | 0]) + b"abcde" + bytes([(4 << 2) | 2, 5, 0])
    assert tfc.snappy_decompress(stream) == b"abcdeabcde"


def test_snappy_overlapping_copy():
    # "ab" then copy len 6 offset 2 -> "abababab" (RLE-style overlap)
    stream = bytes([8, (1 << 2) | 0]) + b"ab" + bytes([(5 << 2) | 2, 2, 0])
    assert tfc.snappy_decompress(stream) == b"abababab"


# ---------------------------------------------------------------- bundle io


def _example_tensors():
    import ml_dtypes

    rng = np.random.default_rng(0)
    return {
        "generator/generator_in/conv/weight": rng.normal(size=(1, 3, 3, 8, 8)).astype(np.float32),
        "generator/generator_in/conv/bias": np.zeros((8,), np.float32),
        "discriminator/discriminator_out/dense_2/weight": rng.normal(size=(16, 1)).astype(np.float64),
        "counts": np.arange(7, dtype=np.int64),
        "flag": np.asarray(True),
        "scalar_step": np.asarray(123, np.int32),
        "bf16_block": rng.normal(size=(33, 5)).astype(ml_dtypes.bfloat16),
        # > 2**14 bytes forces multi-byte varint offsets/sizes in entries
        "big": rng.normal(size=(70, 70)).astype(np.float32),
    }


def test_bundle_round_trip(tmp_path):
    tensors = _example_tensors()
    prefix = str(tmp_path / "model_3")
    tfc.write_tensor_bundle(prefix, tensors)
    back = tfc.read_tensor_bundle(prefix)
    assert set(back) == set(tensors)
    for k in tensors:
        assert back[k].dtype == tensors[k].dtype, k
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(tensors[k]))


def test_bundle_files_and_magic(tmp_path):
    prefix = str(tmp_path / "ckpt")
    tfc.write_tensor_bundle(prefix, {"w": np.ones((2, 2), np.float32)})
    blob = open(prefix + ".index", "rb").read()
    assert struct.unpack("<Q", blob[-8:])[0] == 0xDB4775248B80FB57
    data = open(prefix + ".data-00000-of-00001", "rb").read()
    assert data == np.ones((2, 2), np.float32).tobytes()


def test_corruption_detected(tmp_path):
    prefix = str(tmp_path / "ckpt")
    tfc.write_tensor_bundle(prefix, {"w": np.arange(16, dtype=np.float32)})
    data_path = prefix + ".data-00000-of-00001"
    raw = bytearray(open(data_path, "rb").read())
    raw[3] ^= 0xFF
    open(data_path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="crc"):
        tfc.read_tensor_bundle(prefix)
    # opt-out still reads (corrupted) bytes
    tfc.read_tensor_bundle(prefix, verify=False)


def test_snappy_compressed_block_is_readable(tmp_path):
    """A foreign writer may emit snappy-compressed blocks (type 1)."""
    entry = tfc.BundleEntry(np.dtype(np.float32), (2,), 0, 0, 8,
                            tfc.masked_crc32c(np.float32([1, 2]).tobytes()))
    data_block = tfc._build_block([(b"", tfc._encode_header(1)),
                                   (b"w", entry.encode())])
    # single-literal snappy stream of the block
    assert len(data_block) < 60 + 1
    compressed = tfc._encode_varint(len(data_block)) + bytes(
        [((len(data_block) - 1) << 2) | 0]) + data_block

    parts, off = [], 0
    trailer = bytes([1]) + struct.pack("<I", tfc.masked_crc32c(compressed + bytes([1])))
    parts.append(compressed + trailer)
    d_off, d_size = off, len(compressed)
    off += len(compressed) + 5
    meta = tfc._build_block([])
    m_off, m_size, off = tfc._append_block(parts, off, meta)
    index = tfc._build_block([(b"w", tfc._encode_varint(d_off) + tfc._encode_varint(d_size))])
    i_off, i_size, off = tfc._append_block(parts, off, index)
    footer = (tfc._encode_varint(m_off) + tfc._encode_varint(m_size)
              + tfc._encode_varint(i_off) + tfc._encode_varint(i_size))
    footer += b"\x00" * (40 - len(footer)) + struct.pack("<Q", 0xDB4775248B80FB57)
    prefix = str(tmp_path / "snappy_ckpt")
    open(prefix + ".index", "wb").write(b"".join(parts) + footer)
    open(prefix + ".data-00000-of-00001", "wb").write(np.float32([1, 2]).tobytes())

    out = tfc.read_tensor_bundle(prefix)
    np.testing.assert_array_equal(out["w"], np.float32([1, 2]))


def test_partitioned_variables_rejected():
    # BundleEntryProto with a slices field (7, length-delimited)
    buf = tfc._field(1, 0, 1) + tfc._field(7, 2, b"\x08\x01")
    with pytest.raises(ValueError, match="slices"):
        tfc.BundleEntry.decode(buf)


def test_multiple_data_blocks_readable(tmp_path):
    """TF's table builder splits entries across ~4KB data blocks; the reader
    must walk every index entry, not just the first."""
    t1 = np.float32([1, 2, 3])
    t2 = np.float32([[4, 5], [6, 7]])
    e1 = tfc.BundleEntry(t1.dtype, t1.shape, 0, 0, t1.nbytes,
                         tfc.masked_crc32c(t1.tobytes()))
    e2 = tfc.BundleEntry(t2.dtype, t2.shape, 0, t1.nbytes, t2.nbytes,
                         tfc.masked_crc32c(t2.tobytes()))
    block1 = tfc._build_block([(b"", tfc._encode_header(1)), (b"a/w", e1.encode())])
    block2 = tfc._build_block([(b"b/w", e2.encode())])

    parts, off = [], 0
    b1_off, b1_size, off = tfc._append_block(parts, off, block1)
    b2_off, b2_size, off = tfc._append_block(parts, off, block2)
    meta = tfc._build_block([])
    m_off, m_size, off = tfc._append_block(parts, off, meta)
    index = tfc._build_block([
        (b"a/w", tfc._encode_varint(b1_off) + tfc._encode_varint(b1_size)),
        (b"b/w", tfc._encode_varint(b2_off) + tfc._encode_varint(b2_size)),
    ])
    i_off, i_size, off = tfc._append_block(parts, off, index)
    footer = (tfc._encode_varint(m_off) + tfc._encode_varint(m_size)
              + tfc._encode_varint(i_off) + tfc._encode_varint(i_size))
    footer += b"\x00" * (40 - len(footer)) + struct.pack("<Q", 0xDB4775248B80FB57)
    prefix = str(tmp_path / "multiblock")
    open(prefix + ".index", "wb").write(b"".join(parts) + footer)
    open(prefix + ".data-00000-of-00001", "wb").write(t1.tobytes() + t2.tobytes())

    out = tfc.read_tensor_bundle(prefix)
    np.testing.assert_array_equal(out["a/w"], t1)
    np.testing.assert_array_equal(out["b/w"], t2)


def test_prefix_compressed_keys_readable(tmp_path):
    """Real leveldb blocks share key prefixes between restarts; parse one."""
    # entries: "gen/a" (restart, shared=0), "gen/b" (shared=4 'gen/')
    v1, v2 = b"V1", b"V2222"
    out = bytearray()
    out += tfc._encode_varint(0) + tfc._encode_varint(5) + tfc._encode_varint(len(v1))
    out += b"gen/a" + v1
    out += tfc._encode_varint(4) + tfc._encode_varint(1) + tfc._encode_varint(len(v2))
    out += b"b" + v2
    out += struct.pack("<I", 0) + struct.pack("<I", 1)  # one restart at 0
    got = dict(tfc._parse_block_entries(bytes(out)))
    assert got == {b"gen/a": v1, b"gen/b": v2}


# ------------------------------------------------------------- name mapping


def test_split_bundle_names():
    t = {
        "generator/g1/weight": np.ones(1),
        "generator/g1/weight/ExponentialMovingAverage": np.full(1, 2.0),
        "generator/g1/weight/Adam": np.zeros(1),
        "generator/g1/weight/Adam_1": np.zeros(1),
        "beta1_power": np.asarray(0.9),
        "global_step": np.asarray(7),
        "discriminator/d1/bias": np.ones(3),
    }
    params, ema, skipped = tfc.split_bundle_names(t)
    assert set(params) == {"generator/g1/weight", "discriminator/d1/bias"}
    assert set(ema) == {"generator/g1/weight"}
    assert ema["generator/g1/weight"][0] == 2.0
    assert sorted(skipped) == ["beta1_power", "generator/g1/weight/Adam",
                               "generator/g1/weight/Adam_1", "global_step"]


# -------------------------------------------------------------- end to end


def test_migration_round_trip_pgan(tmp_path):
    """Model params -> npz -> TF bundle -> npz -> name-intersection restore:
    the full migration loop a reference user would run (reference-released
    checkpoints are this bundle format, reference README.md:33-43)."""
    import jax

    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train.checkpoint import load_params, restore_into, save_params

    cfg = Config(
        architecture="pgan",
        start_shape="(1, 1, 4, 4)",
        final_shape="(1, 16, 64, 64)",
        latent_dim=32,
        base_batch_size=2,
        network_size="xs",
        g_lr=1e-3,
        d_lr=1e-3,
    ).finalize()
    arch = get_architecture("pgan")
    params = arch.init(jax.random.PRNGKey(0), phase=2, cfg=cfg)
    ema = {k: np.asarray(v) * 0.5 for k, v in params.items()}

    npz1 = save_params(str(tmp_path / "model_2"), params, ema=ema)
    prefix = str(tmp_path / "tf" / "model_2")
    tfc.export_tf_checkpoint(npz1, prefix, verbose=False)
    npz2 = tfc.import_tf_checkpoint(prefix, str(tmp_path / "back" / "model_2"),
                                    verbose=False)

    p2, e2, meta = load_params(npz2)
    assert meta.get("imported_from_tf") == 1.0
    assert set(p2) == set(params)
    for k in params:
        np.testing.assert_array_equal(p2[k], np.asarray(params[k]))
        np.testing.assert_array_equal(e2[k], ema[k])

    # name-intersection restore into a phase-3 model: phase-2 names load,
    # new layers keep their init (the reference chaining semantics)
    params3 = arch.init(jax.random.PRNGKey(1), phase=3, cfg=cfg)
    restored = restore_into(params3, p2)
    loaded = [k for k in params3 if k in p2]
    fresh = [k for k in params3 if k not in p2]
    assert loaded and fresh
    for k in loaded:
        np.testing.assert_array_equal(np.asarray(restored[k]), p2[k])
    for k in fresh:
        np.testing.assert_array_equal(np.asarray(restored[k]), np.asarray(params3[k]))


def test_cli_entrypoints(tmp_path):
    from saragan_tpu.train.checkpoint import save_params

    npz = save_params(str(tmp_path / "m"), {"generator/w": np.ones((2,), np.float32)})
    prefix = str(tmp_path / "tfm")
    assert tfc.main(["export", npz, prefix]) == 0
    assert tfc.main(["import", prefix, str(tmp_path / "m2")]) == 0
    from saragan_tpu.train.checkpoint import load_params

    p, _, _ = load_params(str(tmp_path / "m2"))
    np.testing.assert_array_equal(p["generator/w"], np.ones((2,), np.float32))


def test_show_lists_variables_without_reading_data(tmp_path):
    tensors = {"generator/w": np.zeros((3, 4), np.float32),
               "counts": np.arange(5, dtype=np.int64)}
    prefix = str(tmp_path / "m")
    tfc.write_tensor_bundle(prefix, tensors)
    os.remove(prefix + ".data-00000-of-00001")  # index-only listing
    rows = tfc.show_tf_checkpoint(prefix)
    assert rows == [("counts", (5,), "int64"), ("generator/w", (3, 4), "float32")]
    assert tfc.main(["show", prefix]) == 0
