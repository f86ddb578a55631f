"""2D image pipeline + gradient accumulation tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saragan_tpu.data.imagenet import ImageNetDataset, ImagePipeline
from saragan_tpu.optim.accumulate import grad_accumulate, split_microbatches


@pytest.fixture
def imagenet_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        for cls in ("n001", "n002", "n003"):
            d = tmp_path / "imagenet" / split / cls
            d.mkdir(parents=True)
            for i in range(4):
                arr = rng.integers(0, 255, size=(12, 16, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.JPEG")
    return str(tmp_path / "imagenet")


def test_imagenet_dataset_classes(imagenet_dir):
    ds = ImageNetDataset(imagenet_dir, num_classes=2)
    files, labels = ds.files_and_labels(train=True)
    assert len(files) == 8 and sorted(set(labels)) == [0, 1]
    assert ds.ix_to_label[0] == "n001"
    tfiles, tlabels = ds.files_and_labels(train=False)
    assert len(tfiles) == 8


def test_image_pipeline_batches(imagenet_dir):
    ds = ImageNetDataset(imagenet_dir, num_classes=3)
    files, labels = ds.files_and_labels()
    pipe = ImagePipeline(files, labels, size=8, batch_size=4, seed=1)
    imgs, labs = pipe.next_batch()
    assert imgs.shape == (4, 3, 8, 8) and labs.shape == (4,)
    assert imgs.dtype == np.float32
    assert -1.0 <= imgs.min() and imgs.max() <= 1.0
    pipe.close()


def test_image_pipeline_sharded_exactly_once(imagenet_dir):
    ds = ImageNetDataset(imagenet_dir, num_classes=3)
    files, labels = ds.files_and_labels()
    pipes = [ImagePipeline(files, labels, 8, 3, num_shards=2, shard_index=i, seed=5)
             for i in range(2)]
    seen = []
    for _ in range(2):  # 2 batches x 2 shards x 3 = one epoch of 12
        for p in pipes:
            _, labs = p.next_batch()
            seen.extend(labs.tolist())
    assert sorted(seen) == sorted(ds.train_labels)
    for p in pipes:
        p.close()


def test_scratch_copy(imagenet_dir, tmp_path):
    scratch = str(tmp_path / "scratch")
    ds = ImageNetDataset(imagenet_dir, scratch_dir=scratch, copy_files=True,
                         is_correct_phase=True, num_classes=1)
    files, _ = ds.files_and_labels()
    assert all(f.startswith(scratch) for f in files)
    assert all(os.path.isfile(f) for f in files)


def test_accumulate_grads_matches_full_batch():
    w = {"w": jnp.asarray([1.0, 2.0])}
    x = jnp.arange(8.0).reshape(8, 1) * jnp.ones((8, 2))

    def loss(params, batch):
        return jnp.mean((batch @ params["w"]) ** 2)

    grad_fn = jax.grad(loss)
    full = grad_fn(w, x)
    accum = grad_accumulate(lambda mb, k: grad_fn(w, mb), x, jax.random.PRNGKey(0), 4)
    np.testing.assert_allclose(np.asarray(accum["w"]), np.asarray(full["w"]), rtol=1e-6)


def test_image_adapter_batch_sharded_exactly_once(imagenet_dir):
    """2D counterpart of batch_sharded: 2 shards of the same deterministic
    stream cover each epoch's files exactly once (reference shards its
    tf.data pipeline by hvd.rank, SURFGAN_2D/main.py:66-103)."""
    from saragan_tpu.data.imagenet import ImageNetDataset, ImageDatasetAdapter

    ds = ImageNetDataset(imagenet_dir, is_correct_phase=True, num_classes=1)
    files, labels = ds.files_and_labels()
    n = len(files)
    a = ImageDatasetAdapter(files, labels, 8, seed=3)
    b = ImageDatasetAdapter(files, labels, 8, seed=3)
    per = n // 2
    batch_a = a.batch_sharded(per, 2, 0)
    batch_b = b.batch_sharded(per, 2, 1)
    assert batch_a.shape[0] == per and batch_b.shape[0] == per
    # distinct shards: the two halves must not overlap (compare by content)
    fa = {batch_a[i].tobytes() for i in range(per)}
    fb = {batch_b[i].tobytes() for i in range(per)}
    assert not (fa & fb)
