"""Dataset pipeline tests: exactly-once sharded batching, ordered splits,
normalization round-trips, prefetcher."""

import os

import numpy as np
import pytest

from saragan_tpu.data import (
    NumpyPathDataset,
    Prefetcher,
    invert_normalize_numpy,
    normalize_numpy,
    stdnormal_to_8bit_numpy,
)


@pytest.fixture
def datadir(tmp_path):
    d = tmp_path / "4x4"
    d.mkdir()
    for i in range(10):
        np.save(d / f"{i:03d}.npy", np.full((4, 4, 4), i, np.float32))
    return str(d)


def test_glob_and_shapes(datadir):
    ds = NumpyPathDataset(datadir)
    assert len(ds) == 10
    assert ds.shape == (1, 4, 4, 4)
    b = ds.batch(3)
    assert b.shape == (3, 1, 4, 4, 4)


def test_batch_exactly_once_per_epoch(datadir):
    ds = NumpyPathDataset(datadir, seed=1)
    seen = []
    for _ in range(5):
        seen.extend(ds.batch_paths(2, auto_repeat=True))
    # one full epoch: every file exactly once
    assert sorted(os.path.basename(p) for p in seen) == sorted(
        f"{i:03d}.npy" for i in range(10)
    )


def test_batch_sharded_exactly_once(datadir):
    """All shards together see each sample exactly once per epoch, with no
    communication (deterministic shared shuffle stream)."""
    shards = [NumpyPathDataset(datadir, seed=7) for _ in range(2)]
    all_values = []
    for _ in range(5):  # 5 global batches of 2*1 = one epoch
        for idx, ds in enumerate(shards):
            b = ds.batch_sharded(1, num_shards=2, shard_index=idx)
            all_values.append(int(b[0, 0, 0, 0, 0]))
    assert sorted(all_values) == list(range(10))


def test_split_order_preserving(datadir):
    ds = NumpyPathDataset(datadir)
    train, testval = ds.split_by_fraction(0.8)
    val, test = testval.split_by_fraction(0.5)
    assert len(train) == 8 and len(val) == 1 and len(test) == 1
    # order-preserving: first 8 files in train (reference dataset.py:217-252)
    assert [os.path.basename(p) for p in train] == [f"{i:03d}.npy" for i in range(8)]
    assert os.path.basename(test[0]) == "009.npy"


def test_auto_repeat_underrun(datadir):
    ds = NumpyPathDataset(datadir)
    b = ds.batch(25, auto_repeat=True)  # > 2 epochs
    assert b.shape[0] == 25


def test_scratch_copy(tmp_path, datadir):
    scratch = tmp_path / "scratch"
    ds = NumpyPathDataset(datadir, str(scratch), copy_files=True, is_correct_phase=True)
    assert len(ds) == 10
    assert str(scratch) in ds.scratch_dir
    assert len(os.listdir(ds.scratch_dir)) == 10


def test_normalize_roundtrip():
    x = np.random.default_rng(0).normal(1000.0, 500.0, size=(4, 4)).astype(np.float32)
    n = normalize_numpy(x, 1000.0, 500.0)
    np.testing.assert_allclose(n.mean(), 0.0, atol=0.7)
    back = invert_normalize_numpy(n, 1000.0, 500.0)
    np.testing.assert_allclose(back, x, rtol=1e-5)
    # identity when both None; error when only one given
    assert normalize_numpy(x, None, None) is x
    with pytest.raises(Exception):
        normalize_numpy(x, 1.0, None)
    with pytest.raises(Exception):
        invert_normalize_numpy(x, None, 1.0)


def test_stdnormal_to_8bit():
    x = np.array([-3.0, -2.0, 0.0, 2.0, 3.0])
    out = stdnormal_to_8bit_numpy(x)
    np.testing.assert_array_equal(out, [0, 0, 128, 255, 255])
    assert out.dtype == int


def test_fast_forward_replays_stream(datadir):
    """fast_forward(n) lands on exactly the position n sequential draws
    reach — the exact-resume property (a requeued run replays the
    uninterrupted run's batch sequence, trainer.py resume block), across
    epoch boundaries and for one-big-draw vs many-small-draws."""
    a = NumpyPathDataset(datadir, seed=5)
    b = NumpyPathDataset(datadir, seed=5)
    # consume 7 batches of 4 (28 paths, crosses the 10-file epoch twice)
    consumed = [a.batch_paths(4) for _ in range(7)]
    b.fast_forward(7 * 4)
    for _ in range(3):  # identical continuation
        assert a.batch_paths(4) == b.batch_paths(4)
    # zero is a no-op
    c = NumpyPathDataset(datadir, seed=5)
    c.fast_forward(0)
    assert c.batch_paths(4) == consumed[0]

    # deep skip: whole epochs are advanced arithmetically (advisor round-4
    # low finding — the old form materialized the entire skipped stream);
    # position must still match sequential draws exactly
    deep = 10 * 397 + 3  # many epochs + a partial one (10-file dataset)
    d1 = NumpyPathDataset(datadir, seed=5)
    d2 = NumpyPathDataset(datadir, seed=5)
    seq = []
    while len(seq) < deep:
        seq.extend(d1.batch_paths(4))
    d1.samplebuffer = seq[deep:] + d1.samplebuffer  # rewind overshoot
    d2.fast_forward(deep)
    for _ in range(4):
        assert d1.batch_paths(4) == d2.batch_paths(4)
    # exact-epoch-boundary skip (buffer consumed to exactly empty)
    e1 = NumpyPathDataset(datadir, seed=5)
    e2 = NumpyPathDataset(datadir, seed=5)
    e1.batch_paths(10)  # one full epoch
    e2.fast_forward(10)
    assert e1.batch_paths(4) == e2.batch_paths(4)


def test_prefetcher(datadir):
    ds = NumpyPathDataset(datadir)
    pf = Prefetcher(lambda: ds.batch(2), depth=2)
    shapes = [next(pf).shape for _ in range(4)]
    pf.stop()
    assert all(s == (2, 1, 4, 4, 4) for s in shapes)


def test_prefetcher_propagates_errors():
    def boom():
        raise RuntimeError("loader failed")

    pf = Prefetcher(boom)
    with pytest.raises(RuntimeError, match="loader failed"):
        next(pf)
    pf.stop()
