"""2D end-to-end: pgan 2D trained on an ImageNet-style directory through
the same phase driver (configs[0] analog — SURFGAN_2D pgan at 32x32)."""

import os

import numpy as np
import pytest

from saragan_tpu.config import Config
from saragan_tpu.data.imagenet import imagenet_dataset_factory
from saragan_tpu.train.trainer import Trainer


@pytest.fixture
def imagenet_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        d = tmp_path / "imagenet" / split / "n001"
        d.mkdir(parents=True)
        for i in range(10):
            arr = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.JPEG")
    return str(tmp_path / "imagenet")


def test_2d_pgan_two_phase_run(imagenet_dir, tmp_path):
    cfg = Config(
        architecture="pgan",
        dataset_path=imagenet_dir,
        start_shape="(3, 4, 4)",
        final_shape="(3, 16, 16)",
        starting_phase=1,
        ending_phase=2,
        latent_dim=16,
        base_batch_size=4,
        mixing_nimg=8,
        stabilizing_nimg=8,
        checkpoint_every_nsteps=10_000,
        kernel_spec=[[[], [3, 3]], [[3, 3], [3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
        conv_kernel_size=(3, 3),
        loss_fn="wgan",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
        logdir=str(tmp_path / "logs2d"),
        validation_fraction=0.2,
        test_fraction=0.2,
    ).finalize()

    tr = Trainer(cfg, dataset_factory=imagenet_dataset_factory(cfg, imagenet_dir), verbose=False)
    tr.run()
    assert os.path.isfile(os.path.join(cfg.logdir, "model_1.npz"))
    assert os.path.isfile(os.path.join(cfg.logdir, "model_2.npz"))
    # 2D conv weights have 4D shapes
    from saragan_tpu.train import checkpoint as ckpt

    params, _, _ = ckpt.load_params(os.path.join(cfg.logdir, "model_2.npz"))
    assert params["generator/generator_block_2/conv_1/weight"].shape == (3, 3, 8, 8)


def test_2d_cli_autoselects_imagenet_dataset(imagenet_dir, tmp_path):
    """Without an explicit dataset_factory, a 2D config whose dataset_path
    is an ImageNet class-folder layout must reach the JPEG pipeline from the
    plain CLI path (the 2D sibling's `dataset` positional,
    SURFGAN_2D/main.py:669 — here --dataset / auto-detection)."""
    from saragan_tpu.data.imagenet import ImageDatasetAdapter

    cfg = Config(
        architecture="pgan",
        dataset_path=imagenet_dir,
        start_shape="(3, 4, 4)",
        final_shape="(3, 16, 16)",
        latent_dim=16,
        base_batch_size=4,
        kernel_spec=[[[], [3, 3]], [[3, 3], [3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
        conv_kernel_size=(3, 3),
        g_lr=1e-3,
        d_lr=1e-3,
        logdir=str(tmp_path / "logs2d_auto"),
    ).finalize()
    tr = Trainer(cfg, verbose=False)
    ds = tr._get_dataset(1)
    assert isinstance(ds, ImageDatasetAdapter)
    # explicit kind wins regardless of layout
    cfg2 = Config(**{**cfg.__dict__, "dataset": "imagenet"}).finalize()
    tr2 = Trainer(cfg2, verbose=False)
    assert isinstance(tr2._get_dataset(1), ImageDatasetAdapter)


def test_2d_g_adam_d_lamb_with_accumulation(imagenet_dir, tmp_path):
    """The reference 2D path's hardwired configuration: G on Adam, D on LAMB
    with decoupled weight decay, plus micro-batch gradient accumulation
    (SURFGAN_2D/main.py:206-212, optim.py:95-160) — end-to-end through the
    phase driver (VERDICT r1 item 5)."""
    cfg = Config(
        architecture="pgan",
        dataset_path=imagenet_dir,
        start_shape="(3, 4, 4)",
        final_shape="(3, 8, 8)",
        starting_phase=1,
        ending_phase=1,
        latent_dim=16,
        base_batch_size=4,
        mixing_nimg=8,
        stabilizing_nimg=8,
        checkpoint_every_nsteps=10_000,
        kernel_spec=[[[], [3, 3]], [[3, 3], [3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
        conv_kernel_size=(3, 3),
        loss_fn="wgan",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=2.5e-3,
        optimizer="Adam",
        d_use_different_optimizer=True,
        d_optimizer="LAMB",
        weight_decay=0.004,
        gradient_accumulation=2,
        logdir=str(tmp_path / "logs2d_lamb"),
        validation_fraction=0.2,
        test_fraction=0.2,
    ).finalize()
    assert cfg.d_optimizer == "LAMB" and cfg.optimizer == "Adam"

    tr = Trainer(cfg, dataset_factory=imagenet_dataset_factory(cfg, imagenet_dir), verbose=False)
    tr.run()
    assert os.path.isfile(os.path.join(cfg.logdir, "model_1.npz"))
