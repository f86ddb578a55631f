"""CLI parsing + end-to-end CLI smoke run + generation tools."""

import json
import os

import numpy as np
import pytest

from saragan_tpu.cli import build_parser, config_from_args, main
from saragan_tpu.config import Config


def test_parser_flag_surface(tmp_path):
    spec = {"kernel_spec": [[[], [3, 3, 3]]], "filter_spec": [[8, 8]]}
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(spec))
    argv = [
        "pgan", "/data",
        "--start_shape", "(1, 4, 4, 4)",
        "--final_shape", "(1, 16, 16, 16)",
        "--starting_phase", "1", "--ending_phase", "2",
        "--latent_dim", "32", "--noise_stddev", "0.01",
        "--kernel_spec", str(spec_path), "--filter_spec", str(spec_path),
        "--g_lr", "None", "--d_lr", "0.002",
        "--optimizer", "None",
        "--data_mean", "1000", "--data_stddev", "500",
        "--compute_dtype", "bfloat16",
    ]
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    assert cfg.architecture == "pgan" and cfg.dataset_path == "/data"
    assert cfg.g_lr is None and cfg.d_lr == 0.002  # None-able types
    assert cfg.optimizer is None
    assert cfg.kernel_spec == spec["kernel_spec"]
    assert cfg.data_mean == 1000.0
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.num_phases == 2


REFERENCE_3D_MAIN = "/root/reference/SURFGAN_3D/main.py"
REFERENCE_2D_MAIN = "/root/reference/SURFGAN_2D/main.py"


@pytest.mark.skipif(not os.path.exists(REFERENCE_3D_MAIN),
                    reason="reference checkout not present")
def test_every_reference_flag_is_accepted():
    """Automated CLI-surface parity: every flag the reference's argparse
    defines (3D main.py:234-354 AND the 2D sibling's) must be accepted by
    build_parser(), so a reference user's launch command parses unchanged
    (modulo the two positionals, which are identical)."""
    import re

    known = {o for a in build_parser()._actions for o in a.option_strings}
    positionals = [a.dest for a in build_parser()._actions if not a.option_strings]

    for path in (REFERENCE_3D_MAIN, REFERENCE_2D_MAIN):
        if not os.path.exists(path):
            continue
        src = open(path).read()
        flags = re.findall(r"add_argument\(\s*['\"](--[a-zA-Z0-9_]+)['\"]", src)
        missing = sorted(set(f for f in flags if f not in known))
        assert not missing, f"{path}: reference flags not accepted: {missing}"
        # positional parity: the 3D flagship's layout is the contract.  The
        # 2D sibling's extra positionals (`dataset` kind, positional
        # final_shape, SURFGAN_2D/main.py:668-671) map to the unified CLI's
        # --dataset / --final_shape flags — assert those exist instead.
        ref_pos = re.findall(r"add_argument\(\s*['\"]([a-zA-Z_][a-zA-Z0-9_]*)['\"]", src)
        if path == REFERENCE_3D_MAIN:
            assert ref_pos == positionals, (ref_pos, positionals)
        else:
            for extra in set(ref_pos) - set(positionals):
                assert f"--{extra}" in known, f"{path}: no flag for positional {extra!r}"


def test_cli_end_to_end_tiny_run(tmp_path):
    """configs[0]-style smoke: full CLI -> harness -> trainer on synthetic data."""
    from tests.test_trainer import make_pyramid

    make_pyramid(tmp_path / "data", n=8)
    argv = [
        "pgan", str(tmp_path / "data"),
        "--start_shape", "(1, 4, 4, 4)",
        "--final_shape", "(1, 8, 8, 8)",
        "--starting_phase", "1", "--ending_phase", "1",
        "--latent_dim", "16", "--noise_stddev", "0.0",
        "--base_batch_size", "4",
        "--mixing_nimg", "4", "--stabilizing_nimg", "4",
        "--g_lr", "0.001", "--d_lr", "0.001",
        "--loss_fn", "wgan",
        "--network_size", "xxs",
        "--logdir", str(tmp_path / "logs"),
    ]
    main(argv)
    assert os.path.isfile(tmp_path / "logs" / "model_1.npz")


def test_generate_minimal_and_report(tmp_path):
    from tests.test_trainer import make_pyramid, tiny_cfg
    from saragan_tpu.train.trainer import Trainer
    from saragan_tpu.tools.generate import generate, generate_minimal

    make_pyramid(tmp_path / "data", n=8)
    cfg = tiny_cfg(tmp_path, ending_phase=1, mixing_nimg=4, stabilizing_nimg=4)
    Trainer(cfg, verbose=False).run()
    model = os.path.join(cfg.logdir, "model_1")

    paths = generate_minimal(
        "pgan", model, str(tmp_path / "gen"), cfg=cfg, phase=1, num_samples=3,
        data_mean=1000.0, data_stddev=500.0,
    )
    assert len(paths) == 3
    vol = np.load(paths[0])
    assert vol.shape == (4, 4, 4)
    # un-normalization applied: values on HU-ish scale
    assert abs(vol).max() > 5

    report = generate(
        "pgan", cfg.dataset_path, model, str(tmp_path / "report"), cfg=cfg, phase=1,
        num_samples=4, batch_size=2,
        compute_metrics=dict(compute_FID=False, compute_swds=False, compute_ssims=False,
                             compute_psnrs=True, compute_mses=True, compute_nrmses=True),
    )
    assert {"psnr", "mse", "nrmse"} <= set(report)
    assert os.path.isfile(tmp_path / "report" / "summary.txt")
    assert os.path.isfile(tmp_path / "report" / "fake_0000.png")


# ---------------------------------------------------------------------------
# StableHLO serving export (tools/export_model.py)
# ---------------------------------------------------------------------------


def test_export_generator_roundtrip(tmp_path):
    """Export -> serialize -> deserialize -> call must reproduce the live
    generator exactly, with params baked in (self-contained artifact)."""
    import jax
    import numpy as np

    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.tools.export_model import (
        export_generator,
        load_exported,
        save_exported,
    )

    cfg = Config(
        architecture="pgan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 16, 16, 16)",
        starting_phase=2,
        ending_phase=2,
        latent_dim=8,
        network_size="xxs",
    ).finalize()
    arch = get_architecture("pgan")
    params = arch.init(jax.random.PRNGKey(0), phase=2, cfg=cfg)

    blob = export_generator(cfg, phase=2, g_params=params, batch_size=2, seed=3)
    path = save_exported(str(tmp_path / "g.stablehlo"), blob)
    gen = load_exported(path)

    z = np.random.default_rng(0).normal(size=(2, 8)).astype(np.float32)
    out = np.asarray(gen(z))
    assert out.shape == (2, 1, 8, 8, 8)

    # live reference (same fused-transition config as the export path)
    import dataclasses

    live_cfg = dataclasses.replace(cfg, fused_transitions=True, use_pallas_fusion=False)
    live = np.asarray(arch.generator(
        params, z, 0.0, phase=2, cfg=live_cfg, rng=jax.random.PRNGKey(3), train=False))
    np.testing.assert_allclose(out, live, rtol=1e-5, atol=1e-5)


def test_export_generator_unbaked_params(tmp_path):
    import jax
    import numpy as np

    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.tools.export_model import export_generator, load_exported, save_exported

    cfg = Config(
        architecture="pgan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 16, 16, 16)",
        starting_phase=2,
        ending_phase=2,
        latent_dim=8,
        network_size="xxs",
    ).finalize()
    arch = get_architecture("pgan")
    params = arch.init(jax.random.PRNGKey(0), phase=2, cfg=cfg)
    blob = export_generator(cfg, phase=2, g_params=params, batch_size=2,
                            bake_params=False)
    gen = load_exported(save_exported(str(tmp_path / "g2.stablehlo"), blob))
    z = np.zeros((2, 8), np.float32)
    out = np.asarray(gen(dict(params), z))
    assert out.shape == (2, 1, 8, 8, 8)
    assert np.all(np.isfinite(out))


def test_starting_phase_beyond_num_phases_fails_fast():
    """A run whose phase loop would be empty must fail loudly, not exit 0
    having trained nothing (num_phases = log2(final/start), reference
    utils.py:211-217)."""
    with pytest.raises(ValueError, match="starting_phase"):
        Config(
            architecture="pgan",
            start_shape="(1, 4, 4, 4)",
            final_shape="(1, 8, 8, 8)",  # num_phases == 1
            starting_phase=2,
            ending_phase=2,
            latent_dim=8,
        ).finalize()
