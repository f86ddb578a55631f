"""Graceful preemption (cfg.graceful_shutdown): SIGTERM/SIGINT finish the
in-flight step, write an exact-resume full-state checkpoint, and exit 75.

The reference's SLURM .jb jobs are requeueable but lose all progress since
the last cadence checkpoint (tf.train.Saver every checkpoint_every_nsteps,
optuna_objective.py:409-419, optimizer slots never saved); here preemption
loses zero steps and the resume carries optimizer slots + counters.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from saragan_tpu.config import Config
from saragan_tpu.train.trainer import Trainer, TrainingInterrupted

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_data(root, n=12, size=4):
    rng = np.random.default_rng(0)
    d = os.path.join(root, f"{size}x{size}")
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        np.save(os.path.join(d, f"{i:04d}.npy"),
                rng.normal(size=(size,) * 3).astype(np.float32))


def tiny_cfg(tmp_path, **kw):
    defaults = dict(
        architecture="pgan",
        dataset_path=str(tmp_path / "data"),
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 8, 8, 8)",
        starting_phase=1,
        ending_phase=1,
        latent_dim=16,
        base_batch_size=4,
        mixing_nimg=16,
        stabilizing_nimg=16,
        checkpoint_every_nsteps=10_000,
        summary_small_every_nsteps=1_000,
        summary_large_every_nsteps=1_000,
        metrics_every_nsteps=1_000,
        kernel_spec=[[[], [3, 3, 3]]],
        filter_spec=[[8, 8]],
        loss_fn="wgan",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
        logdir=str(tmp_path / "logs"),
        validation_fraction=0.2,
        test_fraction=0.2,
    )
    defaults.update(kw)
    return Config(**defaults).finalize()


def test_interrupt_writes_resume_checkpoint_and_resumes(tmp_path, capsys):
    """Flag set before the loop -> step 1 completes, TrainingInterrupted is
    raised with a .pkl that a fresh process resumes from mid-phase."""
    make_data(tmp_path / "data")
    cfg = tiny_cfg(tmp_path)
    tr = Trainer(cfg, verbose=False)
    tr._interrupt = signal.SIGTERM  # as if the handler fired mid-step
    with pytest.raises(TrainingInterrupted) as e:
        tr.run()
    exc = e.value
    # exactly one completed step (global batch 4) before unwinding
    assert exc.phase == 1 and exc.global_step == 4
    assert exc.resume_path.endswith(".pkl") and os.path.isfile(exc.resume_path)
    assert "--continue_path" in str(exc)
    # a params .npz checkpoint rides along for inference tools
    assert os.path.isfile(
        exc.resume_path.replace("_interrupt.pkl", "") + ".npz")
    # state survives on the trainer, finite
    for v in tr.state.g_params.values():
        assert np.all(np.isfinite(np.asarray(v)))

    # resume: full-state continue_path restores counters + optimizer slots
    # and completes the phase in the remaining budget
    cfg2 = tiny_cfg(tmp_path, continue_path=exc.resume_path,
                    logdir=str(tmp_path / "logs2"))
    tr2 = Trainer(cfg2, verbose=True)
    tr2.run()
    out = capsys.readouterr().out
    assert "Resumed counters: step 4" in out
    assert os.path.isfile(os.path.join(cfg2.logdir, "model_1.npz"))


def test_interrupt_midphase_resume_trains_full_remaining_schedule(tmp_path, capsys):
    """Interrupt at phase 2 of a 3-phase run, resume per the hint
    (--continue_path PKL --starting_phase 2): the restored cumulative
    global_step is rebased onto the resumed run's schedule, so phase 2
    finishes its remaining budget and phase 3 trains a FULL budget —
    instead of every remaining phase exiting after one step (the stored
    step already exceeded the rebased thresholds)."""
    from saragan_tpu.train import checkpoint as ckpt

    make_data(tmp_path / "data", size=4)
    make_data(tmp_path / "data", size=8)
    make_data(tmp_path / "data", size=16)
    spec3 = dict(
        kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]],
                     [[3, 3, 3], [3, 3, 3]]],
        filter_spec=[[8, 8], [8, 8], [8, 8]],
    )
    cfg = tiny_cfg(tmp_path, final_shape="(1, 32, 32, 32)", ending_phase=3,
                   metrics_every_nsteps=8, calc_metrics=True, **spec3)
    tr = Trainer(cfg, verbose=False)

    def interrupt_at_phase_2(trainer, sampler, ds, global_step, suffix):
        if trainer.phase == 2 and trainer._interrupt is None:
            trainer._interrupt = signal.SIGTERM
        return {}

    tr.metrics_callback = interrupt_at_phase_2
    with pytest.raises(TrainingInterrupted) as e:
        tr.run()
    exc = e.value
    assert exc.phase == 2
    # the original run is cumulative from starting_phase 1: interrupted
    # mid-phase-2, its stored step exceeds one phase's budget (32 imgs)
    assert exc.global_step > 32
    assert f"--starting_phase 2" in str(exc)

    # resume EXACTLY per the hint
    cfg2 = tiny_cfg(tmp_path, final_shape="(1, 32, 32, 32)", ending_phase=3,
                    starting_phase=2, continue_path=exc.resume_path,
                    logdir=str(tmp_path / "logs_resumed"), **spec3)
    Trainer(cfg2, verbose=False).run()
    # phase 2 exits at its own full budget, phase 3 at a further full budget
    # — NOT after a single step each.  global_step keeps the ORIGINAL run's
    # cumulative numbering (phase 2 began at img 32 of the phase-1 run), so
    # checkpoint filenames stay monotone across resumes and
    # find_auto_resume / prune_cadence_checkpoints newest-by-step ranking
    # survives repeated preemption (advisor round-3 high finding).
    _, _, meta2 = ckpt.load_params(os.path.join(cfg2.logdir, "model_2.npz"))
    _, _, meta3 = ckpt.load_params(os.path.join(cfg2.logdir, "model_3.npz"))
    assert int(meta2["global_step"]) == 64, meta2
    assert int(meta3["global_step"]) == 96, meta3


def test_interrupt_on_final_step_completes_phase_and_hints_next(tmp_path):
    """A signal landing on a phase's FINAL step must complete the phase
    (EMA fold + model_<phase>), not write a mid-phase resume point —
    resuming that .pkl would re-enter the finished phase and train one
    extra step an uninterrupted run never has.  The hint becomes a
    phase-boundary resume: --continue_path model_<phase>.npz
    --starting_phase <phase+1>, exactly what _restore_for_phase does
    between phases of an uninterrupted run."""
    from saragan_tpu.train import checkpoint as ckpt

    make_data(tmp_path / "data", size=4)
    make_data(tmp_path / "data", size=8)
    spec2 = dict(
        kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
    )
    cfg = tiny_cfg(tmp_path, final_shape="(1, 16, 16, 16)", ending_phase=2,
                   calc_metrics=True, metrics_every_nsteps=4, **spec2)
    tr = Trainer(cfg, verbose=False)

    def interrupt_on_final_step(trainer, sampler, ds, global_step, suffix):
        # fires right after the step that completes phase 1's 32-img budget,
        # BEFORE the loop's interrupt check in the same iteration
        if trainer.phase == 1 and global_step >= 32 and trainer._interrupt is None:
            trainer._interrupt = signal.SIGTERM
        return {}

    tr.metrics_callback = interrupt_on_final_step
    with pytest.raises(TrainingInterrupted) as e:
        tr.run()
    exc = e.value
    assert exc.phase == 2 and "--starting_phase 2" in str(exc)
    assert exc.resume_path.endswith("model_1.npz") and os.path.isfile(exc.resume_path)
    # the phase completed at EXACTLY its budget; no mid-phase artifacts
    _, _, meta1 = ckpt.load_params(os.path.join(cfg.logdir, "model_1.npz"))
    assert int(meta1["global_step"]) == 32, meta1
    assert not [f for f in os.listdir(cfg.logdir) if f.endswith("_interrupt.pkl")]

    # resume per the hint: phase 2 trains its FULL budget
    cfg2 = tiny_cfg(tmp_path, final_shape="(1, 16, 16, 16)", ending_phase=2,
                    starting_phase=2, continue_path=exc.resume_path,
                    logdir=str(tmp_path / "logs_resumed"), **spec2)
    Trainer(cfg2, verbose=False).run()
    _, _, meta2 = ckpt.load_params(os.path.join(cfg2.logdir, "model_2.npz"))
    assert int(meta2["global_step"]) == 32, meta2


def test_signal_handler_safe_with_unwritable_stdout(tmp_path, monkeypatch):
    """The handler runs at an arbitrary bytecode boundary — possibly INSIDE
    a buffered sys.stdout write, where print() raises RuntimeError
    ('reentrant call') and unwinds the loop without the graceful
    checkpoint.  It must therefore never touch sys.stdout (os.write to the
    stderr fd is async-signal-safe)."""
    make_data(tmp_path / "data")
    cfg = tiny_cfg(tmp_path)
    tr = Trainer(cfg, verbose=False)

    class ReentrantGuard:
        def write(self, *a):
            raise RuntimeError("reentrant call inside <_io.BufferedWriter>")

        def flush(self):
            raise RuntimeError("reentrant call inside <_io.BufferedWriter>")

    monkeypatch.setattr(sys, "stdout", ReentrantGuard())
    tr._handle_signal(signal.SIGTERM, None)  # must not raise
    assert tr._interrupt == signal.SIGTERM


def test_diverged_hint_skips_post_divergence_checkpoints(tmp_path):
    """Checkpoints keep being written between summary steps; one written
    after params went NaN must never be the rewind hint.  Cadence here:
    summaries on steps 1,3,5,7; checkpoints at loop-top of steps 3,5,7
    (capturing state after steps 2,4,6).  NaN data starts at step 4, so
    the step-5 loop-top checkpoint (ckpt_16) holds NaN params and the
    step-5 summary detects divergence — the hint must name ckpt_8
    (confirmed finite by step 3's summary), not ckpt_16."""
    from saragan_tpu.data.dataset import NumpyPathDataset
    from saragan_tpu.train import checkpoint as ckpt
    from saragan_tpu.train.trainer import TrainingDiverged

    make_data(tmp_path / "data")

    class NaNAfterThree(NumpyPathDataset):
        calls = 0

        def batch(self, batch_size, auto_repeat=True, verbose=False):
            b = super().batch(batch_size, auto_repeat, verbose)
            type(self).calls += 1
            if type(self).calls > 3:
                b = np.full_like(b, np.nan)
            return b

    cfg = tiny_cfg(tmp_path, abort_on_nonfinite=True,
                   checkpoint_every_nsteps=8,
                   summary_small_every_nsteps=8,
                   validation_fraction=0.0, test_fraction=0.0)
    factory = lambda phase: NaNAfterThree(str(tmp_path / "data" / "4x4"))
    tr = Trainer(cfg, verbose=False, prefetch=False, dataset_factory=factory)
    with pytest.raises(TrainingDiverged) as e:
        tr.run()
    exc = e.value
    assert exc.last_checkpoint and exc.last_checkpoint.endswith("model_1_ckpt_8.npz"), exc.last_checkpoint
    # the hinted checkpoint is finite; the NEWER one on disk is not — the
    # old "name the last written checkpoint" hint would have pointed there
    good, _, _ = ckpt.load_params(exc.last_checkpoint)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in good.values())
    bad, _, _ = ckpt.load_params(os.path.join(cfg.logdir, "model_1_ckpt_16.npz"))
    assert not all(np.all(np.isfinite(np.asarray(v))) for v in bad.values())


def test_find_auto_resume_ranking(tmp_path):
    """Pure ranking logic over synthetic logdir layouts (no training)."""
    from saragan_tpu.train.checkpoint import find_auto_resume

    d = tmp_path / "log"
    assert find_auto_resume(str(d), 2) is None  # missing dir

    d.mkdir()
    (d / "events.jsonl").write_text("")
    assert find_auto_resume(str(d), 2) is None  # nothing recognizable

    # completed phase 1 -> boundary resume into phase 2 from its npz
    (d / "model_1.npz").write_bytes(b"x")
    ar = find_auto_resume(str(d), 2)
    assert ar.starting_phase == 2 and ar.continue_path.endswith("model_1.npz")
    assert not ar.complete

    # a LATER phase's mid-phase pkl beats the completed-phase npz
    (d / "model_2_ckpt_48_interrupt.pkl").write_bytes(b"x")
    ar = find_auto_resume(str(d), 2)
    assert ar.starting_phase == 2
    assert ar.continue_path.endswith("model_2_ckpt_48_interrupt.pkl")

    # within one phase the highest step wins; interrupt breaks step ties
    (d / "model_2_ckpt_64_full.pkl").write_bytes(b"x")
    assert find_auto_resume(str(d), 2).continue_path.endswith(
        "model_2_ckpt_64_full.pkl")
    (d / "model_2_ckpt_64_interrupt.pkl").write_bytes(b"x")
    assert find_auto_resume(str(d), 2).continue_path.endswith(
        "model_2_ckpt_64_interrupt.pkl")

    # a completed phase supersedes that phase's own mid-phase pkls
    (d / "model_2.npz").write_bytes(b"x")
    ar = find_auto_resume(str(d), 3)
    assert ar.starting_phase == 3 and ar.continue_path.endswith("model_2.npz")

    # final phase complete -> nothing to do
    assert find_auto_resume(str(d), 2).complete


def test_auto_resume_requeues_same_command_line(tmp_path, capsys):
    """The preemption loop end-to-end: interrupt -> rebuild the IDENTICAL
    config with auto_resume (what a requeued scheduler job does) -> the run
    finds the _interrupt.pkl itself, restores counters, completes the
    phase; a third requeue sees model_1.npz and trains nothing."""
    make_data(tmp_path / "data")
    cfg = tiny_cfg(tmp_path, auto_resume=True)
    tr = Trainer(cfg, verbose=False)
    tr._interrupt = signal.SIGTERM
    with pytest.raises(TrainingInterrupted):
        tr.run()

    # requeue: same flags, no --continue_path edits
    cfg2 = tiny_cfg(tmp_path, auto_resume=True)
    assert cfg2.continue_path is None
    tr2 = Trainer(cfg2, verbose=True)
    assert cfg2.continue_path and cfg2.continue_path.endswith("_interrupt.pkl")
    tr2.run()
    out = capsys.readouterr().out
    assert "auto_resume: continuing from" in out
    assert "Resumed counters: step 4" in out
    model = os.path.join(cfg2.logdir, "model_1.npz")
    assert os.path.isfile(model)

    # requeue after completion: a no-op, nothing rewritten
    mtime = os.path.getmtime(model)
    cfg3 = tiny_cfg(tmp_path, auto_resume=True)
    tr3 = Trainer(cfg3, verbose=True)
    assert tr3._already_complete
    tr3.run()
    assert "training complete, nothing to do" in capsys.readouterr().out
    assert os.path.getmtime(model) == mtime

    # an EXPLICIT --continue_path always wins over the scan
    cfg4 = tiny_cfg(tmp_path, auto_resume=True, continue_path="/explicit.npz")
    Trainer(cfg4, verbose=False)
    assert cfg4.continue_path == "/explicit.npz"


def test_second_signal_escalates(tmp_path):
    """The first signal sets the interrupt flag AND restores the previous
    handlers, so a second Ctrl-C during a multi-minute compile (or a wedged
    relay fetch) takes its normal effect instead of being swallowed."""
    make_data(tmp_path / "data")
    cfg = tiny_cfg(tmp_path)
    tr = Trainer(cfg, verbose=False)
    prev = signal.getsignal(signal.SIGTERM)
    # as run() installs it
    tr._installed_handlers = {signal.SIGTERM: prev}
    signal.signal(signal.SIGTERM, tr._handle_signal)
    try:
        tr._handle_signal(signal.SIGTERM, None)
        assert tr._interrupt == signal.SIGTERM
        # escalation: the handler put the PREVIOUS handler back
        assert signal.getsignal(signal.SIGTERM) is prev
        assert tr._installed_handlers == {}
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_diverged_hint_names_checkpoint_phase():
    """The rewind hint must carry --starting_phase of the checkpoint:
    _restore_for_phase honors --continue_path only at phase ==
    starting_phase, so omitting it would partial-restore late-phase weights
    into the run's first phase instead of rewinding."""
    from saragan_tpu.train.trainer import TrainingDiverged

    e = TrainingDiverged(6, 1234, float("nan"), 1.0,
                         "/x/model_6_ckpt_1200.npz", 6)
    assert "--continue_path /x/model_6_ckpt_1200.npz" in str(e)
    assert "--starting_phase 6" in str(e)


def test_handlers_restored_after_run(tmp_path):
    """run() must leave the process's SIGTERM/SIGINT handlers as it found
    them (HPO harnesses and test runners own them otherwise)."""
    make_data(tmp_path / "data")
    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)
    cfg = tiny_cfg(tmp_path, mixing_nimg=8, stabilizing_nimg=8)
    Trainer(cfg, verbose=False).run()
    assert signal.getsignal(signal.SIGTERM) is prev_term
    assert signal.getsignal(signal.SIGINT) is prev_int


def test_abort_on_nonfinite_fails_fast_with_rewind_hint(tmp_path):
    """NaN training data -> NaN losses at the first summary step; with
    --abort_on_nonfinite the run raises TrainingDiverged instead of
    training on (the reference's behavior, which stays the default)."""
    from saragan_tpu.train.trainer import TrainingDiverged

    make_data(tmp_path / "data")
    # poison the dataset: one-in-three volumes carries NaN voxels
    d = tmp_path / "data" / "4x4"
    for i in range(0, 12, 3):
        v = np.load(d / f"{i:04d}.npy")
        v[0, 0, 0] = np.nan
        np.save(d / f"{i:04d}.npy", v)
    cfg = tiny_cfg(tmp_path, abort_on_nonfinite=True,
                   summary_small_every_nsteps=4)
    with pytest.raises(TrainingDiverged) as e:
        Trainer(cfg, verbose=False).run()
    assert "non-finite losses" in str(e.value)
    assert "no checkpoint written yet" in str(e.value)  # diverged at step 1

    # default (reference parity): the same poisoned run trains through NaN
    cfg2 = tiny_cfg(tmp_path, summary_small_every_nsteps=4,
                    logdir=str(tmp_path / "logs_nan"))
    Trainer(cfg2, verbose=False).run()
    assert os.path.isfile(os.path.join(cfg2.logdir, "model_1.npz"))


def test_repeated_preemption_resumes_newest_not_stale(tmp_path, capsys):
    """Advisor round-3 HIGH finding: preempt -> requeue -> preempt again.
    Round-3 code rebased global_step phase-relative on resume, so the
    second interrupt's filename step was SMALLER than the first's and the
    third requeue resumed the STALE pkl, discarding all post-resume
    progress (livelock under repeated preemption).  Now global_step keeps
    the original cumulative numbering AND the consumed pkl is deleted once
    a newer full-state save lands — each requeue resumes strictly newer
    state."""
    from saragan_tpu.train import checkpoint as ckpt

    make_data(tmp_path / "data", size=4)
    make_data(tmp_path / "data", size=8)
    spec2 = dict(
        kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
    )
    kw = dict(final_shape="(1, 16, 16, 16)", ending_phase=2,
              mixing_nimg=24, stabilizing_nimg=24, auto_resume=True, **spec2)

    def interrupt_at(trigger_step):
        def cb(trainer, sampler, ds, global_step, suffix):
            if (trainer.phase == 2 and global_step >= trigger_step
                    and trainer._interrupt is None):
                trainer._interrupt = signal.SIGTERM
            return {}
        return cb

    # leg 1: preempted early in phase 2 (cumulative step > phase-1's 48)
    cfg = tiny_cfg(tmp_path, metrics_every_nsteps=8, calc_metrics=True, **kw)
    tr = Trainer(cfg, verbose=False)
    tr.metrics_callback = interrupt_at(52)
    with pytest.raises(TrainingInterrupted) as e1:
        tr.run()
    pkl1 = e1.value.resume_path
    step1 = e1.value.global_step
    assert step1 > 48  # cumulative, phase 2 territory

    # leg 2 (requeue, SAME flags): resumes pkl1, preempted again later
    cfg2 = tiny_cfg(tmp_path, metrics_every_nsteps=8, calc_metrics=True, **kw)
    tr2 = Trainer(cfg2, verbose=False)
    assert cfg2.continue_path == pkl1  # the auto_resume scan ran in __init__
    tr2.metrics_callback = interrupt_at(step1 + 8)
    with pytest.raises(TrainingInterrupted) as e2:
        tr2.run()
    pkl2 = e2.value.resume_path
    # post-resume progress carries LARGER step numbers than the first
    # interrupt (round-3 numbering restarted at 4 here)...
    assert e2.value.global_step > step1, (e2.value.global_step, step1)
    # ...and the consumed first pkl is gone (superseded by pkl2)
    assert not os.path.exists(pkl1), pkl1
    assert os.path.exists(pkl2)

    # leg 3: resumes the NEWEST state — pkl2, not anything stale
    cfg3 = tiny_cfg(tmp_path, metrics_every_nsteps=8, **kw)
    tr3 = Trainer(cfg3, verbose=False)
    assert cfg3.continue_path == pkl2, (cfg3.continue_path, pkl2)
    tr3.run()
    # full schedule completed: phase 2 final at cumulative 96 (2 x 48)
    _, _, meta2 = ckpt.load_params(os.path.join(cfg3.logdir, "model_2.npz"))
    assert int(meta2["global_step"]) == 96, meta2


def test_prune_after_resume_keeps_newest(tmp_path):
    """Advisor round-3 MEDIUM finding: with keep_checkpoints, the round-3
    rebased numbering made prune_cadence_checkpoints delete the FRESHEST
    post-resume checkpoints and keep stale pre-preemption ones.  With
    cumulative numbering the newest saves survive and the oldest are
    pruned."""
    make_data(tmp_path / "data", size=4)
    kw = dict(mixing_nimg=24, stabilizing_nimg=24, auto_resume=True,
              checkpoint_every_nsteps=8, keep_checkpoints=2,
              full_state_checkpoints=True,
              metrics_every_nsteps=8, calc_metrics=True)

    cfg = tiny_cfg(tmp_path, **kw)
    tr = Trainer(cfg, verbose=False)

    def cb(trainer, sampler, ds, global_step, suffix):
        if global_step >= 16 and trainer._interrupt is None:
            trainer._interrupt = signal.SIGTERM
        return {}

    tr.metrics_callback = cb
    with pytest.raises(TrainingInterrupted):
        tr.run()

    cfg2 = tiny_cfg(tmp_path, **kw)
    tr2 = Trainer(cfg2, verbose=False)
    assert cfg2.continue_path and cfg2.continue_path.endswith("_interrupt.pkl")
    tr2.run()

    cadence = sorted(
        int(f.split("_ckpt_")[1].split(".")[0].split("_")[0])
        for f in os.listdir(cfg2.logdir)
        if "_ckpt_" in f and f.endswith(".npz")
    )
    # the survivors are the run's NEWEST cadence steps (> the preemption
    # step), not the stale pre-preemption ones round-3 numbering kept
    assert cadence, os.listdir(cfg2.logdir)
    assert min(cadence) > 16, cadence


def test_diverged_right_after_resume_still_hints(tmp_path):
    """Advisor round-3 LOW finding: _last_finite_checkpoint was process-
    local, so a divergence detected before the first post-resume finite
    summary raised with last_checkpoint=None even though the resume point
    exists on disk.  Now the resume point seeds the hint."""
    from saragan_tpu.data.dataset import NumpyPathDataset
    from saragan_tpu.train.trainer import TrainingDiverged

    make_data(tmp_path / "data")
    kw = dict(mixing_nimg=24, stabilizing_nimg=24, auto_resume=True,
              abort_on_nonfinite=True, summary_small_every_nsteps=8,
              metrics_every_nsteps=8, calc_metrics=True,
              validation_fraction=0.0, test_fraction=0.0)

    cfg = tiny_cfg(tmp_path, **kw)
    tr = Trainer(cfg, verbose=False)

    def cb(trainer, sampler, ds, global_step, suffix):
        if trainer._interrupt is None:
            trainer._interrupt = signal.SIGTERM
        return {}

    tr.metrics_callback = cb
    with pytest.raises(TrainingInterrupted) as e:
        tr.run()
    pkl = e.value.resume_path

    # requeue against NaN-poisoned data: the first post-resume summary
    # detects divergence with no post-resume finite summary ever seen
    class AllNaN(NumpyPathDataset):
        def batch(self, batch_size, auto_repeat=True, verbose=False):
            b = super().batch(batch_size, auto_repeat, verbose)
            return np.full_like(b, np.nan)

    cfg2 = tiny_cfg(tmp_path, **kw)
    factory = lambda phase: AllNaN(str(tmp_path / "data" / "4x4"))
    tr2 = Trainer(cfg2, verbose=False, prefetch=False, dataset_factory=factory)
    assert cfg2.continue_path == pkl
    with pytest.raises(TrainingDiverged) as e2:
        tr2.run()
    exc = e2.value
    # the hint names the resume point's cadence npz (known-finite), with
    # the phase it restores into — not "no checkpoint written yet"
    assert exc.last_checkpoint, str(exc)
    assert exc.last_checkpoint.endswith(".npz")
    assert os.path.isfile(exc.last_checkpoint)
    assert exc.checkpoint_phase == 1
    good, _, _ = __import__("saragan_tpu.train.checkpoint", fromlist=["load_params"]).load_params(exc.last_checkpoint)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in good.values())


def test_finite_then_diverge_after_resume_keeps_hint(tmp_path):
    """Advisor round-4 MEDIUM finding: after a resume, the FIRST finite
    summary executed `_last_finite_checkpoint = _last_checkpoint`, and
    _last_checkpoint was still None until the first in-process cadence save
    — so a finite-then-diverge sequence (the common divergence shape)
    clobbered the seeded hint back to None and dropped the resume point
    from the prune protect set.  _seed_finite_checkpoint now seeds
    _last_checkpoint too: a later finite summary re-confirms the resume
    point instead of erasing it."""
    from saragan_tpu.data.dataset import NumpyPathDataset
    from saragan_tpu.train.trainer import TrainingDiverged

    make_data(tmp_path / "data")
    kw = dict(mixing_nimg=24, stabilizing_nimg=24, auto_resume=True,
              abort_on_nonfinite=True, summary_small_every_nsteps=8,
              metrics_every_nsteps=8, calc_metrics=True,
              validation_fraction=0.0, test_fraction=0.0)

    cfg = tiny_cfg(tmp_path, **kw)
    tr = Trainer(cfg, verbose=False)

    def cb(trainer, sampler, ds, global_step, suffix):
        if trainer._interrupt is None:
            trainer._interrupt = signal.SIGTERM
        return {}

    tr.metrics_callback = cb
    with pytest.raises(TrainingInterrupted):
        tr.run()

    # requeue against data that is finite for the first post-resume summary
    # (exercising the clobbering branch) and NaN afterwards
    class NaNAfter(NumpyPathDataset):
        draws = 0

        def batch(self, batch_size, auto_repeat=True, verbose=False):
            b = super().batch(batch_size, auto_repeat, verbose)
            NaNAfter.draws += 1
            return np.full_like(b, np.nan) if NaNAfter.draws > 2 else b

    cfg2 = tiny_cfg(tmp_path, **kw)
    factory = lambda phase: NaNAfter(str(tmp_path / "data" / "4x4"))
    tr2 = Trainer(cfg2, verbose=False, prefetch=False, dataset_factory=factory)
    assert cfg2.continue_path and cfg2.continue_path.endswith("_interrupt.pkl")
    with pytest.raises(TrainingDiverged) as e2:
        tr2.run()
    exc = e2.value
    # no in-process cadence save happened (checkpoint_every_nsteps huge):
    # the hint must still name the known-finite resume-point npz
    assert exc.last_checkpoint, str(exc)
    assert exc.last_checkpoint.endswith(".npz")
    assert os.path.isfile(exc.last_checkpoint)
    assert exc.checkpoint_phase == 1


@pytest.mark.parametrize("lazy_gp", [1, 2])
def test_preempted_resume_end_state_equals_uninterrupted(tmp_path, lazy_gp):
    """The preemption loop's strongest property (VERDICT r3 item 7): a
    preempted-then-requeued run ends BITWISE-IDENTICAL to an uninterrupted
    one.  Three ingredients make it hold: full-state resume (params +
    optimizer slots + counters), fold_in(base, local_step) step keys
    (resume-invariant — a sequential split carry would replay from the
    phase start), and dataset fast_forward (the shared shuffle stream
    resumes at the position completed steps consumed, prefetch overshoot
    excluded).

    lazy_gp=2 additionally pins the GP-application cadence across a resume
    (advisor round-4 low finding: a loop-local step counter reset to 0 on
    resume and shifted the every-k-th-step GP phase; the cadence now
    derives from the persisted local_step)."""
    from saragan_tpu.train import checkpoint as ckpt

    make_data(tmp_path / "data")
    base = dict(mixing_nimg=24, stabilizing_nimg=24,
                metrics_every_nsteps=8, calc_metrics=True, lazy_gp=lazy_gp)

    def noop_cb(trainer, sampler, ds, global_step, suffix):
        return {}

    # uninterrupted reference run (same cadences incl. metrics callback)
    cfg_u = tiny_cfg(tmp_path, logdir=str(tmp_path / "logs_u"), **base)
    tr_u = Trainer(cfg_u, verbose=False)
    tr_u.metrics_callback = noop_cb
    tr_u.run()

    # preempted at mid-phase, then requeued with the same flags
    cfg_i = tiny_cfg(tmp_path, logdir=str(tmp_path / "logs_i"),
                     auto_resume=True, **base)
    tr_i = Trainer(cfg_i, verbose=False)

    def interrupt_cb(trainer, sampler, ds, global_step, suffix):
        if global_step >= 16 and trainer._interrupt is None:
            trainer._interrupt = signal.SIGTERM
        return {}

    tr_i.metrics_callback = interrupt_cb
    with pytest.raises(TrainingInterrupted) as e:
        tr_i.run()
    assert 16 <= e.value.global_step < 48  # genuinely mid-phase

    cfg_r = tiny_cfg(tmp_path, logdir=str(tmp_path / "logs_i"),
                     auto_resume=True, **base)
    tr_r = Trainer(cfg_r, verbose=False)
    tr_r.metrics_callback = noop_cb
    assert cfg_r.continue_path and cfg_r.continue_path.endswith("_interrupt.pkl")
    tr_r.run()

    pu, eu, mu = ckpt.load_params(os.path.join(cfg_u.logdir, "model_1.npz"))
    pi, ei, mi = ckpt.load_params(os.path.join(cfg_r.logdir, "model_1.npz"))
    assert mu["global_step"] == mi["global_step"]
    assert set(pu) == set(pi) and set(eu) == set(ei)
    for k in pu:
        np.testing.assert_array_equal(pu[k], pi[k], err_msg=k)
    for k in eu:
        np.testing.assert_array_equal(eu[k], ei[k], err_msg=k)


def test_real_sigterm_at_the_cli_exits_75(tmp_path):
    """Full stack: a real SIGTERM to a running `python -m saragan_tpu`
    process produces exit code 75, the INTERRUPTED line, and the .pkl."""
    make_data(tmp_path / "data")
    logdir = str(tmp_path / "logs_sig")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # never touch the real chip from tests
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.Popen(
        [sys.executable, "-u", "-m", "saragan_tpu", "pgan", str(tmp_path / "data"),
         "--start_shape", "(1, 4, 4, 4)", "--final_shape", "(1, 8, 8, 8)",
         "--starting_phase", "1", "--ending_phase", "1",
         "--latent_dim", "16", "--network_size", "xs",
         "--base_batch_size", "4",
         # budget far beyond the test's lifetime: the signal is the only exit
         "--mixing_nimg", "40000000", "--stabilizing_nimg", "8",
         "--noise_stddev", "0.0", "--g_lr", "1e-3", "--d_lr", "1e-3",
         "--summary_small_every_nsteps", "64",
         "--logdir", logdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # wait for the first training step to have completed (post-compile)
        deadline = time.time() + 600
        lines = []
        for line in p.stdout:
            lines.append(line)
            if "\tStep " in line or line.startswith("Step") or "img/s" in line:
                break
            if time.time() > deadline:
                pytest.fail("no training step within 600s:\n" + "".join(lines)[-4000:])
        p.send_signal(signal.SIGTERM)
        out_rest = p.stdout.read()
        rc = p.wait(timeout=300)
    finally:
        if p.poll() is None:
            p.kill()
    out = "".join(lines) + out_rest
    assert rc == 75, f"exit {rc}; output:\n{out[-4000:]}"
    assert "INTERRUPTED" in out and "--continue_path" in out
    pkls = [f for f in os.listdir(logdir) if f.endswith("_interrupt.pkl")]
    assert len(pkls) == 1, os.listdir(logdir)
