"""2D image dataset (ImageNet-style directory layout) — SURVEY C15.

Rebuild of reference SURFGAN_2D/dataset.py:12-144 + the tf.data pipeline
wiring in SURFGAN_2D/main.py:66-103, without TensorFlow:

* class-labeled `train/` / `test/` folders, class intersection, first
  `num_classes` classes kept, label <-> index maps;
* optional copy-to-scratch with existence busy-wait;
* per-phase pipeline: shuffle -> JPEG decode -> resize to the phase
  resolution -> normalize to [-1, 1] -> CHW -> shard -> batch, implemented
  with PIL + a worker thread pool feeding a background prefetcher (the JAX
  replacement of shuffle/map/shard/batch/prefetch(AUTOTUNE)).

Sharding uses the same deterministic shared-shuffle-stream trick as the 3D
dataset: every shard computes the identical permutation and reads only its
interleaved slice — exactly-once per epoch, no scatter.
"""

from __future__ import annotations

import glob
import os
import random
import shutil
import time
import warnings
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Tuple

import numpy as np


def _decode_resize(path: str, size: int, channels: int = 3) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB" if channels == 3 else "L").resize(
            (size, size), Image.BILINEAR)
        arr = np.asarray(im, np.float32)
    # normalize to [-1, 1], CHW (SURFGAN_2D/main.py:80-90)
    arr = arr / 127.5 - 1.0
    if arr.ndim == 2:
        return arr[None]
    return np.transpose(arr, (2, 0, 1))


class ImageNetDataset:
    def __init__(
        self,
        imagenet_dir: str,
        scratch_dir: Optional[str] = None,
        copy_files: bool = False,
        is_correct_phase: bool = True,
        num_classes: int = 1,
    ):
        train_folder = os.path.join(imagenet_dir, "train")
        test_folder = os.path.join(imagenet_dir, "test")

        classes_train = {
            d for d in os.listdir(train_folder) if os.path.isdir(os.path.join(train_folder, d))
        }
        classes_test = {
            d for d in os.listdir(test_folder) if os.path.isdir(os.path.join(test_folder, d))
        }
        classes = sorted(classes_train & classes_test)[:num_classes]
        assert len(classes) == num_classes, (len(classes), num_classes)

        self.label_to_ix = {label: i for i, label in enumerate(classes)}
        self.ix_to_label = {i: label for label, i in self.label_to_ix.items()}

        def collect(folder):
            files, labels = [], []
            for label in classes:
                for f in sorted(glob.glob(os.path.join(folder, label, "*.JPEG"))) or sorted(
                    glob.glob(os.path.join(folder, label, "*.jpg"))
                ):
                    files.append(f)
                    labels.append(self.label_to_ix[label])
            return files, labels

        train_examples, self.train_labels = collect(train_folder)
        test_examples, self.test_labels = collect(test_folder)

        if scratch_dir is not None and is_correct_phase:
            scratch_dir = os.path.normpath(scratch_dir)

            def to_scratch(files):
                out = []
                for f in files:
                    dst = os.path.normpath(scratch_dir + "/" + f)
                    if copy_files:
                        os.makedirs(os.path.dirname(dst), exist_ok=True)
                        if not os.path.isfile(dst):
                            # atomic temp+rename: concurrent copiers are safe
                            # and the busy-wait below never sees a truncated
                            # file (same invariant as data/dataset.py)
                            tmp = f"{dst}.tmp.{os.getpid()}"
                            shutil.copy(f, tmp)
                            os.replace(tmp, dst)
                    out.append(dst)
                return out

            self.scratch_files_train = to_scratch(train_examples)
            self.scratch_files_test = to_scratch(test_examples)
            while not all(os.path.exists(f) for f in self.scratch_files_train):
                time.sleep(1)
            while not all(os.path.exists(f) for f in self.scratch_files_test):
                time.sleep(1)
        else:
            self.scratch_files_train = train_examples
            self.scratch_files_test = test_examples

        self.is_train = True

    def files_and_labels(self, train: bool = True) -> Tuple[List[str], List[int]]:
        if train:
            return self.scratch_files_train, self.train_labels
        return self.scratch_files_test, self.test_labels

    def __len__(self):
        return len(self.train_labels) if self.is_train else len(self.test_labels)

    def __getitem__(self, idx):
        return (self.train_labels if self.is_train else self.test_labels)[idx]


class ImagePipeline:
    """Per-phase batched pipeline: deterministic shared shuffle, interleaved
    sharding, threaded decode (the tf.data map/shard/batch/prefetch chain)."""

    def __init__(
        self,
        files: List[str],
        labels: List[int],
        size: int,
        batch_size: int,
        num_shards: int = 1,
        shard_index: int = 0,
        seed: int = 42,
        num_workers: int = 4,
        channels: int = 3,
    ):
        self.files = list(files)
        self.labels = list(labels)
        self.size = size
        self.channels = channels
        self.batch_size = batch_size
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.seed = seed
        self._epoch = 0
        self._buffer: List[int] = []
        self._num_workers = num_workers
        self._pool = ThreadPoolExecutor(max_workers=num_workers)
        # native decode (runtime/saragan_jpeg.cc): libjpeg + the PIL
        # antialiased-triangle resize in C++, batched off the GIL —
        # bit-exact at source size, within one uint8 LSB after resize
        # (the reference's tf.data decode_jpeg was native too,
        # SURFGAN_2D/main.py:66-103).  Probed once; any failure falls
        # back to the PIL thread pool permanently.
        self._native = None
        if os.environ.get("SARAGAN_NATIVE_JPEG", "1") != "0":
            from saragan_tpu.data import native as native_io

            if native_io.have_jpeg():
                self._native = native_io.decode_jpeg_batch

    def _refill(self):
        order = list(range(len(self.files)))
        random.Random(f"{self.seed}/{self._epoch}").shuffle(order)
        self._epoch += 1
        shard = order[self.shard_index :: self.num_shards]
        if not shard:
            raise ValueError(
                f"shard {self.shard_index}/{self.num_shards} of a "
                f"{len(self.files)}-file dataset is empty — next_batch would "
                f"spin forever; use fewer shards or more files"
            )
        self._buffer.extend(shard)

    def next_batch(self) -> Tuple[np.ndarray, np.ndarray]:
        while len(self._buffer) < self.batch_size:
            self._refill()
        idxs = self._buffer[: self.batch_size]
        self._buffer = self._buffer[self.batch_size :]
        labels = np.asarray([self.labels[i] for i in idxs], np.int32)
        if self._native is not None:
            batch = self._native([self.files[i] for i in idxs], self.size,
                                 self.channels, self._num_workers)
            if batch is not None:
                return batch, labels
            # e.g. a non-JPEG/truncated file: PIL from here on.  Warn — a
            # silent fallback would pay the thread-pool decode cost for the
            # rest of a long run with zero diagnostic output.
            warnings.warn(
                "native JPEG batch decode failed (one of "
                f"{[os.path.basename(self.files[i]) for i in idxs[:4]]}"
                f"{'...' if len(idxs) > 4 else ''}); falling back to the "
                "PIL thread pool for the rest of this run",
                RuntimeWarning,
            )
            self._native = None
        imgs = list(self._pool.map(lambda i: _decode_resize(self.files[i], self.size, self.channels), idxs))
        return np.stack(imgs), labels

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            yield self.next_batch()

    def close(self):
        self._pool.shutdown(wait=False)


class ImageDatasetAdapter:
    """Presents an (files, labels, size) image source with the
    NumpyPathDataset batching interface so the Trainer's phase driver works
    unchanged for 2D runs (the reference kept a separate 2D main loop,
    SURFGAN_2D/main.py; here one trainer serves both ranks)."""

    def __init__(self, files: List[str], labels: List[int], size: int, seed: int = 42,
                 channels: int = 3):
        self.files = list(files)
        self.labels = list(labels)
        self.size = size
        self.channels = channels
        self.seed = seed
        self._pipe: Optional[ImagePipeline] = None
        self.shape = (1, channels, size, size)

    def _pipeline(self, batch_size: int, num_shards: int = 1,
                  shard_index: int = 0) -> ImagePipeline:
        if (self._pipe is None or self._pipe.batch_size != batch_size
                or self._pipe.num_shards != num_shards
                or self._pipe.shard_index != shard_index):
            if self._pipe is not None:
                self._pipe.close()
            self._pipe = ImagePipeline(self.files, self.labels, self.size, batch_size,
                                       num_shards=num_shards, shard_index=shard_index,
                                       seed=self.seed, channels=self.channels)
        return self._pipe

    def batch(self, batch_size: int, auto_repeat: bool = True, verbose: bool = False):
        if not auto_repeat:
            # the streaming pipeline always repeats; silently looping would
            # double-count an exactly-once sweep (NumpyPathDataset contract)
            raise NotImplementedError(
                "ImageDatasetAdapter.batch only supports auto_repeat=True"
            )
        imgs, _ = self._pipeline(batch_size).next_batch()
        return imgs

    def close(self):
        if self._pipe is not None:
            self._pipe.close()
            self._pipe = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    def batch_sharded(self, local_batch: int, num_shards: int, shard_index: int):
        """Per-process shard of the deterministic shared stream — the 2D
        counterpart of NumpyPathDataset.batch_sharded (reference shards its
        tf.data pipeline by hvd.rank, SURFGAN_2D/main.py:66-103), required by
        the trainer's multi-process path (trainer.py make_batch)."""
        imgs, _ = self._pipeline(local_batch, num_shards, shard_index).next_batch()
        return imgs

    def clone(self, seed_offset: int = 0):
        return ImageDatasetAdapter(self.files, self.labels, self.size,
                                   self.seed + seed_offset, channels=self.channels)

    def split_by_fraction(self, fraction: float):
        n1 = int(np.round(fraction * len(self.files)) + 1e-5)
        return self.split_by_index(n1)

    def split_by_index(self, index: int):
        a = ImageDatasetAdapter(self.files[:index], self.labels[:index], self.size,
                                self.seed, channels=self.channels)
        b = ImageDatasetAdapter(self.files[index:], self.labels[index:], self.size,
                                self.seed, channels=self.channels)
        return a, b

    def __len__(self):
        return len(self.files)


def imagenet_dataset_factory(cfg, imagenet_dir: str, num_classes: int = 1):
    """dataset_factory(phase) for Trainer: ImageNet images at the phase's
    resolution (the reference's per-phase resize, SURFGAN_2D/main.py:66-103)."""
    ds = ImageNetDataset(imagenet_dir, cfg.scratch_path,
                         copy_files=cfg.scratch_path is not None,
                         is_correct_phase=True, num_classes=num_classes)
    files, labels = ds.files_and_labels(train=True)

    def factory(phase: int) -> ImageDatasetAdapter:
        size = cfg.start_shape_t[-1] * 2 ** (phase - 1)
        # honor the config's channel count (grayscale 2D configs get L-mode)
        return ImageDatasetAdapter(files, labels, size, seed=cfg.seed,
                                   channels=cfg.start_shape_t[0])

    return factory
