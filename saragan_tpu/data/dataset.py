"""npy-pyramid dataset.

Rebuild of reference dataset.py:163-353 (`NumpyPathDataset`) with the
multi-host anti-pattern removed: the reference has rank 0 read the *global*
batch from disk every step and MPI-scatter it (dataset.py:293-342) — a
serial I/O bottleneck.  Here every host draws from the **same deterministic
shuffle stream** (seeded numpy Generator shared by construction), so each
host can compute the global epoch permutation independently and load only
its own shard: `batch_mpi`'s exactly-once guarantee without any
communication (SURVEY §5.8: "per-host data loading ... rank0-reads-
everything is an anti-pattern we will not copy").

Preserved semantics:
* glob of `{dir}/*.npy`, one volume per file, channel axis inserted on load;
* optional copy-to-scratch with only one process per node copying and the
  rest busy-waiting on file count (dataset.py:164-188);
* ordered (NOT shuffled) `split_by_fraction` / `split_by_index`, preserving
  patient correlation order (dataset.py:217-252, rationale
  optuna_objective.py:117-122);
* a refillable shuffled sample buffer with `repeat()` extension and
  auto-repeat on underrun (dataset.py:264-349).

Plus a background `Prefetcher` (the 3D reference pipeline was synchronous
and unpipelined — SURVEY §3.1 "input pipeline is synchronous"), and an
optional native C++ loader (saragan_tpu.data.native) used transparently when
built.
"""

from __future__ import annotations

import glob
import os
import queue
import random
import shutil
import threading
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _load_volume(path: str) -> np.ndarray:
    from saragan_tpu.data import native  # late import; optional C++ fast path

    if native.available():
        return native.load_npy(path)
    return np.load(path)


class NumpyPathDataset:
    def __init__(
        self,
        npy_dir: str,
        scratch_dir: Optional[str] = None,
        copy_files: bool = False,
        is_correct_phase: bool = True,
        seed: int = 42,
        _files: Optional[List[str]] = None,
    ):
        if _files is not None:
            # internal: construction from an explicit file list (splits)
            self.npy_files = list(_files)
            self.scratch_files = list(_files)
            self._seed = seed
            self._epoch = 0
            self._init_samplebuffer()
            return

        self.npy_files = sorted(glob.glob(os.path.join(npy_dir, "*.npy")))
        if scratch_dir is not None and scratch_dir.endswith("/"):
            scratch_dir = scratch_dir[:-1]

        self.scratch_dir = (
            os.path.normpath(scratch_dir + "/" + npy_dir) if (scratch_dir and is_correct_phase) else npy_dir
        )
        if copy_files and is_correct_phase and scratch_dir is not None:
            # Every process may attempt the copy (no node-topology knowledge
            # needed — the reference's local_rank-0 scheme assumed MPI):
            # copy-to-temp + atomic rename makes concurrent copiers on a
            # shared filesystem safe, and processes on other nodes populate
            # their own node-local scratch instead of waiting forever.
            os.makedirs(self.scratch_dir, exist_ok=True)
            for f in self.npy_files:
                dst = os.path.join(self.scratch_dir, os.path.basename(f))
                if not os.path.isfile(dst):
                    tmp = f"{dst}.tmp.{os.getpid()}"
                    shutil.copy(f, tmp)
                    os.replace(tmp, dst)

        # busy-wait until some process finished the scratch copy
        # (reference dataset.py:176-180)
        while len(glob.glob(os.path.join(self.scratch_dir, "*.npy"))) < len(self.npy_files):
            time.sleep(1)

        self.scratch_files = sorted(glob.glob(os.path.join(self.scratch_dir, "*.npy")))
        assert len(self.scratch_files) == len(self.npy_files)

        self._seed = seed
        self._epoch = 0
        self._init_samplebuffer()

        if self.scratch_files:
            test = np.load(self.scratch_files[0])[np.newaxis, ...]
            self.shape = test.shape
            self.dtype = test.dtype
            del test

    # ------------------------------------------------------------------
    # sample buffer (deterministic shared shuffle stream)
    # ------------------------------------------------------------------

    def _shuffled_epoch(self) -> List[str]:
        files = self.scratch_files[:]
        rng = random.Random(f"{self._seed}/{self._epoch}")
        rng.shuffle(files)
        self._epoch += 1
        return files

    def _init_samplebuffer(self):
        self._epoch = 0
        self.samplebuffer: List[str] = self._shuffled_epoch()

    def repeat(self):
        """Extend the buffer with a fresh shuffled epoch (dataset.py:344-349)."""
        self.samplebuffer.extend(self._shuffled_epoch())

    # ------------------------------------------------------------------
    # container protocol
    # ------------------------------------------------------------------

    def __iter__(self):
        return iter(self.scratch_files)

    def __getitem__(self, idx):
        return self.scratch_files[idx]

    def __len__(self):
        return len(self.scratch_files)

    # ------------------------------------------------------------------
    # splits (order-preserving; reference dataset.py:217-252)
    # ------------------------------------------------------------------

    def clone(self, seed_offset: int = 0) -> "NumpyPathDataset":
        """Independent view over the same files (own sample buffer/epoch
        state) — callers that need a second draw stream (e.g. validation
        summaries when the dataset is too small to split) must not share one
        buffer with a background prefetch thread."""
        out = NumpyPathDataset(
            "", _files=self.scratch_files, seed=self._seed + seed_offset
        )
        for attr in ("shape", "dtype"):
            if hasattr(self, attr):
                setattr(out, attr, getattr(self, attr))
        return out

    def split_by_fraction(self, fraction: float) -> Tuple["NumpyPathDataset", "NumpyPathDataset"]:
        nsamples_1 = int(np.round(fraction * len(self.scratch_files)) + 1e-5)
        assert nsamples_1 > 0 and len(self.scratch_files) > 0
        return self.split_by_index(nsamples_1)

    def split_by_index(self, index: int) -> Tuple["NumpyPathDataset", "NumpyPathDataset"]:
        d1 = NumpyPathDataset("", seed=self._seed, _files=self.scratch_files[:index])
        d2 = NumpyPathDataset("", seed=self._seed, _files=self.scratch_files[index:])
        for d in (d1, d2):
            d.npy_files = d.scratch_files[:]
            if hasattr(self, "shape"):
                d.shape, d.dtype = self.shape, self.dtype
        return d1, d2

    # ------------------------------------------------------------------
    # batching
    # ------------------------------------------------------------------

    def _load_batch_from_filelist(self, batch_paths: Sequence[str]) -> np.ndarray:
        from saragan_tpu.data import native

        n = len(batch_paths)
        if n > 0 and hasattr(self, "shape") and native.available():
            # fast path: C++ thread-pool reader decodes straight into the
            # contiguous float32 batch (dtype conversion included)
            vol_shape = tuple(self.shape[1:])
            out = np.empty((n, *vol_shape), np.float32)
            if native.load_npy_batch(list(batch_paths), out, num_threads=min(8, n)):
                return out[:, np.newaxis, ...]
        batch = [_load_volume(p).astype("float32") for p in batch_paths]
        if len(batch) > 0:
            batch = np.stack(batch)
            batch = batch[:, np.newaxis, ...]
        return batch

    def batch_paths(self, batch_size: int, auto_repeat: bool = True) -> List[str]:
        # loop, not recursion: a request much larger than the dataset would
        # otherwise need one stack frame per appended epoch
        while batch_size > len(self.samplebuffer):
            if not auto_repeat:
                paths = self.samplebuffer
                self.samplebuffer = []
                return paths
            self.repeat()
        paths = self.samplebuffer[:batch_size]
        self.samplebuffer = self.samplebuffer[batch_size:]
        return paths

    def batch(self, batch_size: int, auto_repeat: bool = True, verbose: bool = False) -> np.ndarray:
        """Per-worker independent sampling (reference dataset.py:264-291)."""
        return self._load_batch_from_filelist(self.batch_paths(batch_size, auto_repeat))

    def fast_forward(self, num_paths: int):
        """Advance the deterministic shuffle stream by `num_paths` draws
        without loading any file.  Exact mid-phase resume uses this to
        replay the uninterrupted run's batch sequence: the trainer's
        restored counters say how many paths completed steps consumed, so
        prefetch overshoot at interrupt time never shifts the stream.

        Whole skipped epochs are advanced ARITHMETICALLY (the shuffle of
        epoch e depends only on `self._epoch`, so bumping the counter is
        stream-exact); only the final partial epoch is materialized.  The
        previous draw-everything form allocated an O(num_paths) path list —
        a multi-million-entry transient for a reference-scale resume deep
        into a phase, on a host already leak-constrained (advisor round-4
        low finding)."""
        if num_paths <= 0:
            return
        if num_paths <= len(self.samplebuffer):
            self.samplebuffer = self.samplebuffer[num_paths:]
            return
        n = len(self.scratch_files)
        assert n > 0, "fast_forward past an empty dataset"
        remaining = num_paths - len(self.samplebuffer)
        self._epoch += (remaining - 1) // n  # whole epochs, counter only
        rem = (remaining - 1) % n + 1  # 1..n draws into the next epoch
        self.samplebuffer = self._shuffled_epoch()[rem:]

    def batch_sharded(
        self,
        batch_size: int,
        num_shards: int,
        shard_index: int,
        auto_repeat: bool = True,
    ) -> np.ndarray:
        """Exactly-once global batching (reference `batch_mpi`,
        dataset.py:293-342) without the rank-0 scatter: all shards share the
        deterministic shuffle stream, draw the same global batch of
        `batch_size * num_shards` paths, and each loads only its slice.

        The reference reshape-transposes the path list so shard i gets paths
        [i, i+num_shards, i+2*num_shards, ...]; we keep that interleaving.
        """
        global_paths = self.batch_paths(batch_size * num_shards, auto_repeat)
        my_paths = global_paths[shard_index::num_shards]
        return self._load_batch_from_filelist(my_paths)


def get_numpy_dataset(
    phase: int,
    starting_phase: int,
    start_shape,
    dataset_path: str,
    scratch_path: Optional[str],
    verbose: bool = False,
    copy_files: bool = False,
    seed: int = 42,
) -> NumpyPathDataset:
    """Resolution-inferred dataset dir `{path}/{S}x{S}/` (reference
    utils.py:195-204)."""
    from saragan_tpu.config import parse_tuple

    start = parse_tuple(start_shape)
    size = start[-1] * (2 ** (phase - 1))
    data_path = os.path.join(dataset_path, f"{size}x{size}/")
    if verbose:
        print(f"Phase {phase}: reading data from dir {data_path}")
    return NumpyPathDataset(
        data_path,
        scratch_path,
        copy_files=copy_files,
        is_correct_phase=phase >= starting_phase,
        seed=seed,
    )


class Prefetcher:
    """Background-thread batch prefetch — overlaps host npy loading with the
    device step (the reference 3D pipeline was fully synchronous, SURVEY
    §3.1). Pull with next(); stop() to shut down."""

    def __init__(self, make_batch, depth: int = 2):
        self._make_batch = make_batch
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            while not self._stop.is_set():
                batch = self._make_batch()
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on next()
            self._exc = e

    def __next__(self):
        while True:
            if self._exc is not None:
                raise self._exc
            try:
                return self._q.get(timeout=0.5)
            except queue.Empty:
                if not self._thread.is_alive() and self._q.empty():
                    if self._exc is not None:
                        raise self._exc
                    raise StopIteration

    def stop(self):
        self._stop.set()
        # drain so the worker can exit a blocked put
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
