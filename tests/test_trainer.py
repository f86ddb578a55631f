"""End-to-end trainer tests on synthetic npy pyramids (configs[0]/[1]-style
smoke runs): multi-phase progressive training, checkpoint chaining,
mid-phase resume, metrics/HPO hooks."""

import glob
import os

import jax
import numpy as np
import pytest

from saragan_tpu.config import Config
from saragan_tpu.train.trainer import Trainer, TrialPruned
from saragan_tpu.train import checkpoint as ckpt


def make_pyramid(root, n=12, sizes=((4, 4, 4), (8, 8, 8)), seed=0):
    rng = np.random.default_rng(seed)
    for s in sizes:
        d = os.path.join(root, f"{s[-1]}x{s[-1]}")
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            np.save(os.path.join(d, f"{i:04d}.npy"), rng.normal(size=s).astype(np.float32))


def tiny_cfg(tmp_path, **kw):
    defaults = dict(
        architecture="pgan",
        dataset_path=str(tmp_path / "data"),
        # num_phases = log2(final/start) = 2 -> trained resolutions 4 and 8
        # (the reference's final_shape sits one doubling past the last phase)
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 16, 16, 16)",
        starting_phase=1,
        ending_phase=2,
        latent_dim=16,
        base_batch_size=4,
        mixing_nimg=8,
        stabilizing_nimg=8,
        checkpoint_every_nsteps=10_000,
        summary_small_every_nsteps=8,
        summary_large_every_nsteps=16,
        metrics_every_nsteps=8,
        kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
        loss_fn="wgan",
        noise_stddev=0.01,
        g_lr=1e-3,
        d_lr=1e-3,
        logdir=str(tmp_path / "logs"),
        validation_fraction=0.2,
        test_fraction=0.2,
    )
    defaults.update(kw)
    return Config(**defaults).finalize()


def test_two_phase_run(tmp_path):
    make_pyramid(tmp_path / "data")
    cfg = tiny_cfg(tmp_path)
    tr = Trainer(cfg, verbose=False)
    tr.run()
    # final checkpoints for both phases exist
    assert os.path.isfile(os.path.join(cfg.logdir, "model_1.npz"))
    assert os.path.isfile(os.path.join(cfg.logdir, "model_2.npz"))
    # phase 2 checkpoint contains grown layers and phase-1 layers
    params, ema, meta = ckpt.load_params(os.path.join(cfg.logdir, "model_2.npz"))
    assert "generator/generator_block_2/conv_1/weight" in params
    assert "generator/generator_in/dense/weight" in params
    assert ema is not None and meta["phase"] == 2
    # state kept on trainer, finite params
    for v in tr.state.g_params.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_phase_chaining_restores_prev_weights(tmp_path):
    """Phase 2 must start from phase 1's (EMA-folded) weights."""
    make_pyramid(tmp_path / "data")
    cfg = tiny_cfg(tmp_path, ending_phase=1)
    tr = Trainer(cfg, verbose=False)
    tr.run()
    p1, _, _ = ckpt.load_params(os.path.join(cfg.logdir, "model_1.npz"))

    cfg2 = tiny_cfg(tmp_path, starting_phase=2, ending_phase=2,
                    continue_path=os.path.join(cfg.logdir, "model_1"))
    tr2 = Trainer(cfg2, verbose=False)
    captured = {}
    orig = tr2._restore_for_phase

    def capture(phase, state):
        state = orig(phase, state)
        # snapshot now — the state buffers get donated once training starts
        captured["w"] = np.asarray(state.g_params["generator/generator_in/dense/weight"]).copy()
        return state

    tr2._restore_for_phase = capture
    tr2.run()
    np.testing.assert_array_equal(captured["w"], p1["generator/generator_in/dense/weight"])


def test_same_phase_continuation_is_full_restore(tmp_path):
    """Mid-phase continuation: --continue_path at the SAME phase restores
    every weight (the name intersection is total) and reseeds the EMA from
    them — the flagship phase-8 continuation-leg semantics (reference
    optuna_objective.py:340-354 restores by intersection regardless of the
    checkpoint's phase)."""
    make_pyramid(tmp_path / "data")
    cfg = tiny_cfg(tmp_path, ending_phase=1)
    Trainer(cfg, verbose=False).run()
    saved, _, meta = ckpt.load_params(os.path.join(cfg.logdir, "model_1"))
    assert meta["phase"] == 1

    cfg2 = tiny_cfg(tmp_path, ending_phase=1,
                    continue_path=os.path.join(cfg.logdir, "model_1"),
                    logdir=str(tmp_path / "logs2"))
    tr2 = Trainer(cfg2, verbose=False)
    captured = {}
    orig = tr2._restore_for_phase

    def capture(phase, state):
        state = orig(phase, state)
        # snapshot now — the state buffers get donated once training starts
        captured["live"] = {k: np.asarray(v).copy()
                            for k, v in {**state.g_params, **state.d_params}.items()}
        captured["ema"] = {k: np.asarray(v).copy() for k, v in state.ema.items()}
        return state

    tr2._restore_for_phase = capture
    tr2.run()
    assert set(captured["live"]) == set(saved), "same-phase restore must be total"
    for k, v in saved.items():
        np.testing.assert_array_equal(captured["live"][k], v)
        np.testing.assert_array_equal(captured["ema"][k], v)
    # the continuation trained on from the restored weights and wrote its own
    # final checkpoint without clobbering the source
    assert os.path.isfile(os.path.join(cfg2.logdir, "model_1.npz"))
    p_src, _, _ = ckpt.load_params(os.path.join(cfg.logdir, "model_1"))
    np.testing.assert_array_equal(
        p_src["generator/generator_in/dense/weight"],
        saved["generator/generator_in/dense/weight"])


def test_metrics_and_pruning_hooks(tmp_path):
    make_pyramid(tmp_path / "data")
    calls = []

    def metrics_cb(trainer, sampler, dataset, step, suffix):
        fake = sampler(jax.random.PRNGKey(0), 2)
        calls.append((step, suffix, fake.shape))
        return {"FID": 123.0}

    class FakeTrial:
        def __init__(self):
            self.reports = []

        def report(self, v, s):
            self.reports.append((v, s))

        def should_prune(self):
            return True  # always asks to prune...

    trial = FakeTrial()
    cfg = tiny_cfg(tmp_path, calc_metrics=True, optuna_warmup_steps=10_000)
    tr = Trainer(cfg, verbose=False, metrics_callback=metrics_cb, trial=trial)
    fid = tr.run()  # ...but warmup_steps > phase length -> never actually prunes
    assert fid == 123.0
    assert trial.reports
    suffixes = {c[1] for c in calls}
    assert "" in suffixes and "_EMA" in suffixes and "_validation" in suffixes

    # with warmup 0, pruning fires
    cfg2 = tiny_cfg(tmp_path, calc_metrics=True, optuna_warmup_steps=0,
                    logdir=str(tmp_path / "logs2"))
    tr2 = Trainer(cfg2, verbose=False, metrics_callback=metrics_cb, trial=FakeTrial())
    with pytest.raises(TrialPruned):
        tr2.run()


def test_checkpoint_roundtrip(tmp_path):
    params = {"a/weight": np.ones((2, 2), np.float32), "b/bias": np.zeros(3, np.float32)}
    ema = {k: v + 0.5 for k, v in params.items()}
    path = ckpt.save_params(str(tmp_path / "m"), params, ema, {"global_step": 7})
    p, e, m = ckpt.load_params(path)
    np.testing.assert_array_equal(p["a/weight"], params["a/weight"])
    np.testing.assert_array_equal(e["b/bias"], ema["b/bias"])
    assert m["global_step"] == 7.0
    # intersection restore: extra keys in current stay, missing ignored
    current = {"a/weight": np.zeros((2, 2), np.float32), "new/weight": np.full(2, 9.0)}
    restored = ckpt.restore_into(current, p)
    np.testing.assert_array_equal(restored["a/weight"], params["a/weight"])
    np.testing.assert_array_equal(restored["new/weight"], current["new/weight"])
    with pytest.raises(KeyError):
        ckpt.restore_into({"nope/x": np.zeros(1)}, p, strict=True)


def test_alternate_strategy_end_to_end(tmp_path):
    """Full run with the alternate (D-then-G) optimization strategy."""
    make_pyramid(tmp_path / "data")
    cfg = tiny_cfg(tmp_path, ending_phase=1, optim_strategy="alternate")
    tr = Trainer(cfg, verbose=False)
    tr.run()
    assert os.path.isfile(os.path.join(cfg.logdir, "model_1.npz"))


def test_trainer_dp_sp_mesh(tmp_path):
    """Trainer over a data x space mesh: batch on 'data', volume depth on
    'space' (configs[3]-style with spatial sharding)."""
    from saragan_tpu.parallel import make_mesh

    make_pyramid(tmp_path / "data", n=16)
    cfg = tiny_cfg(tmp_path, base_batch_size=4, mixing_nimg=8, stabilizing_nimg=8,
                   num_space_shards=2)
    mesh = make_mesh(num_data=2, num_space=2)
    tr = Trainer(cfg, mesh=mesh, verbose=False)
    tr.run()
    assert os.path.isfile(os.path.join(cfg.logdir, "model_2.npz"))


def test_single_chip_big_volume_trainer_end_to_end(tmp_path):
    """The --single_chip_big_volume preset must train end-to-end through the
    plain Trainer: offload remat + unstacked critic passes + Pallas flat
    conv (interpret mode on CPU) — the phase-8 recipe as a framework
    feature, not just a script (BASELINE.md 'Phase-8 on one chip')."""
    from saragan_tpu.ops import core as ops_core

    make_pyramid(tmp_path / "data")
    saved = (ops_core.POOL_WINDOW, ops_core.STATS_ACCUM_F32, ops_core.CONV3D_ALGORITHM)
    try:
        cfg = tiny_cfg(
            tmp_path,
            single_chip_big_volume=True,
            mixing_nimg=4,
            stabilizing_nimg=4,
            metrics_every_nsteps=10_000,
            summary_small_every_nsteps=10_000,
            summary_large_every_nsteps=10_000,
            ending_phase=2,
            starting_phase=2,
        )
        assert cfg.remat_offload and not cfg.batched_passes
        tr = Trainer(cfg, verbose=False)
        # CPU backend: the TPU-only scoped-vmem option must NOT be attached
        assert tr._compiler_options is None
        assert ops_core.CONV3D_ALGORITHM == "pallas"  # preset applied at init
        tr.run()
        for v in tr.state.g_params.values():
            assert np.all(np.isfinite(np.asarray(v)))
    finally:
        ops_core.POOL_WINDOW, ops_core.STATS_ACCUM_F32, ops_core.CONV3D_ALGORITHM = saved
