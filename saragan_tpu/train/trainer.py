"""Phase driver — the training loop.

Functional rebuild of the reference's `optuna_objective`
(/root/reference/SURFGAN_3D/optuna_objective.py:32-648): one call is a full
multi-phase progressive-growing run.  Per phase:

* build the dataset for the phase resolution, ordered train/val/test split
  (optuna_objective.py:115-122);
* per-phase batch size (halved each phase, globally capped) (:127-136);
* init params for the phase and partial-restore the previous phase's
  checkpoint (new layers stay random; EMA reseeded from live weights)
  (:334-354, utils.py:75-118);
* compile two step variants: mixing (prev-phase vars frozen) and
  stabilizing (:446-453) — the JAX analog of the reference's per-phase graph
  rebuild, one compile each since shapes are static within a phase;
* hot loop with image-unit counters, LR schedule, alpha fade, EMA, periodic
  checkpoints, small/large summaries (with `_val` and `_EMA` variants),
  metrics + HPO report/prune hooks, throughput logging (:399-577);
* mixing->stabilizing flip and phase-exit on global image counts
  (:564-576);
* final per-phase checkpoint with EMA folded in + end-of-phase metrics on
  test/val/train sets under EMA weights (:583-629).
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from saragan_tpu import losses
from saragan_tpu.config import Config
from saragan_tpu.data import NumpyPathDataset, Prefetcher, get_numpy_dataset, normalize_numpy
from saragan_tpu.models import get_architecture
from saragan_tpu.optim import lr_schedule, scale_lr
from saragan_tpu.optim.ema import fold_ema
from saragan_tpu.parallel import aot_with_options, jit_train_step, replicated_sharding, shard_global_batch
from saragan_tpu.train import checkpoint as ckpt
from saragan_tpu.train import summaries as summ
from saragan_tpu.train.step import TrainState, init_train_state, make_train_step, split_params


def resolve_transfer_dtype(cfg) -> np.dtype:
    """Numpy dtype for host->device input batches.  'auto' (the default)
    resolves to bfloat16 under bfloat16 compute — BIT-EXACT, because the
    step's first op casts the batch to compute dtype and host-side RNE is
    the same rounding (BASELINE.md input-transfer A/B) — else float32.
    Config.finalize performs the same resolution; this also covers raw
    (unfinalized) configs handed straight to the Trainer."""
    td = getattr(cfg, "transfer_dtype", "auto")
    if td == "auto":
        td = ("bfloat16" if getattr(cfg, "compute_dtype", "float32")
              == "bfloat16" else "float32")
    return np.dtype(
        {"float16": np.float16, "bfloat16": ml_dtypes.bfloat16}.get(
            td, np.float32))


class TrialPruned(Exception):
    """Raised to prune an HPO trial (mirrors optuna.TrialPruned)."""


class TrainingDiverged(Exception):
    """A summary-step loss fetch came back non-finite and
    cfg.abort_on_nonfinite is set.  Fail fast instead of burning the rest
    of a multi-day big-volume run on NaN parameters; the message names the
    last checkpoint a LATER summary confirmed finite as the rewind point
    (checkpoints written between the last finite summary and the divergence
    may already hold NaN params and are never hinted).  (Reference parity
    note: the reference trains on regardless — this guard is opt-in.)"""

    def __init__(self, phase: int, global_step: int, d_loss, g_loss,
                 last_checkpoint: Optional[str],
                 checkpoint_phase: Optional[int] = None):
        # --starting_phase must name the phase the checkpoint was WRITTEN at:
        # _restore_for_phase honors --continue_path only when
        # phase == cfg.starting_phase, so omitting it would partial-restore
        # late-phase weights into the run's first phase instead of rewinding.
        hint = (f"rewind with --continue_path {last_checkpoint}"
                + (f" --starting_phase {checkpoint_phase}"
                   if checkpoint_phase is not None else "")
                if last_checkpoint else "no checkpoint written yet")
        super().__init__(
            f"non-finite losses at phase {phase} step {global_step} "
            f"(d_loss={d_loss}, g_loss={g_loss}); {hint}"
        )
        self.phase = phase
        self.global_step = global_step
        self.last_checkpoint = last_checkpoint
        self.checkpoint_phase = checkpoint_phase


class TrainingInterrupted(Exception):
    """A SIGTERM/SIGINT arrived; the in-flight step finished and an
    exact-resume full-state checkpoint was written (cfg.graceful_shutdown).
    Carries the `.pkl` path to pass back as --continue_path.  The TPU-native
    analog of surviving SLURM preemption: the reference's requeueable .jb
    jobs lose all mid-phase progress (tf.train.Saver ran only on cadence);
    here no step is lost and optimizer slots survive."""

    def __init__(self, resume_path: str, phase: int, global_step: int):
        super().__init__(
            f"training interrupted at phase {phase} step {global_step}; "
            f"resume with --continue_path {resume_path} "
            f"--starting_phase {phase}"
        )
        self.resume_path = resume_path
        self.phase = phase
        self.global_step = global_step


@dataclass
class PhaseResult:
    phase: int
    global_step: int
    last_fid: Optional[float]
    img_s: float


class Trainer:
    def __init__(
        self,
        cfg: Config,
        *,
        mesh=None,
        dataset_factory: Optional[Callable[[int], NumpyPathDataset]] = None,
        metrics_callback: Optional[Callable] = None,
        trial=None,
        verbose: bool = True,
        prefetch: bool = True,
    ):
        """
        dataset_factory(phase) -> NumpyPathDataset override (tests/synthetic).
        metrics_callback(trainer, gen_sample_fn, dataset, step, suffix) -> dict
            with optional 'FID' key; called at the metrics cadence and at
            phase end (the save_metrics orchestrator plugs in here).
        trial: HPO trial with .report(value, step)/.should_prune() — both the
            built-in harness and real Optuna satisfy this.
        """
        self.cfg = cfg
        # op-formulation gates (single-chip big-volume preset; s2d default
        # on TPU) must be set before ANY trace — model init included.
        # spatial=True on a depth/height-sharded mesh keeps the direct conv
        # (the s2d fold's reshape would reshard every conv).
        cfg.apply_runtime_opts(
            spatial=(mesh is not None
                     and (mesh.shape.get("space", 1) > 1
                          or mesh.shape.get("space2", 1) > 1)))
        # per-compile options reach a relayed remote compiler where env
        # flags cannot (BASELINE.md); resolve_compiler_options owns the
        # TPU-only gating, same as bench.py and the serving sampler
        from saragan_tpu.parallel.mesh import resolve_compiler_options

        self._compiler_options = resolve_compiler_options(cfg.scoped_vmem_kib)
        self.arch = get_architecture(cfg.architecture)
        self.mesh = mesh
        self.dataset_factory = dataset_factory
        self.metrics_callback = metrics_callback
        self.trial = trial
        self.verbose = verbose
        self.prefetch = prefetch
        self.logdir = cfg.logdir or os.path.join("runs", cfg.architecture, time.strftime("%Y-%m-%d_%H-%M-%S"))
        # requeue-friendly resume (cfg.auto_resume): a scheduler resubmits
        # the SAME command line after the exit-75 preemption path; pick up
        # from the newest resume point in the logdir instead of requiring
        # the operator to paste the hint's --continue_path/--starting_phase.
        self._already_complete = False
        self._auto_resume_note: Optional[str] = None
        if getattr(cfg, "auto_resume", False) and not cfg.continue_path:
            ar = ckpt.find_auto_resume(self.logdir,
                                       cfg.ending_phase or cfg.num_phases)
            if ar is not None and ar.complete:
                self._already_complete = True
            elif ar is not None:
                cfg.continue_path = ar.continue_path
                cfg.starting_phase = ar.starting_phase
                self._auto_resume_note = (
                    f"auto_resume: continuing from {ar.continue_path} "
                    f"at phase {ar.starting_phase}"
                )
        self.writer = summ.SummaryWriter(self.logdir if verbose else None)
        self.global_size = 1 if mesh is None else int(mesh.shape["data"])
        self.last_fid: Optional[float] = None
        self.last_img_s: float = 0.0
        self.state: Optional[TrainState] = None
        self.phase: Optional[int] = None
        self._eval_step = None
        self._interrupt: Optional[int] = None  # signal number, set by the handler
        self._last_checkpoint: Optional[str] = None
        self._last_checkpoint_phase: Optional[int] = None
        # last checkpoint a LATER summary confirmed finite — the divergence
        # rewind hint (TrainingDiverged) names this one, never a checkpoint
        # that may have been written after params went NaN
        self._last_finite_checkpoint: Optional[str] = None
        self._last_finite_checkpoint_phase: Optional[int] = None
        self._installed_handlers: dict = {}
        # full-state resume keeps global_step on the ORIGINAL run's
        # cumulative numbering (checkpoint filenames stay monotone across
        # auto_resume requeues — the advisor's round-3 livelock: rebased
        # numbering made find_auto_resume prefer the stale pre-preemption
        # pkl and prune_cadence_checkpoints delete the freshest saves).
        # This offset reconciles that numbering with THIS run's
        # starting_phase-relative schedule thresholds; 0 unless resuming
        # with a different --starting_phase than the original run.
        self._step_offset = 0
        # the _interrupt.pkl a full-state restore consumed; superseded
        # (deleted) once a newer full-state save lands, mirroring how a
        # completed phase supersedes its pkls
        self._consumed_interrupt: Optional[str] = None

    # ------------------------------------------------------------------

    def _log(self, msg: str):
        if self.verbose:
            print(msg)

    def _get_dataset(self, phase: int) -> NumpyPathDataset:
        if self.dataset_factory is not None:
            return self.dataset_factory(phase)
        cfg = self.cfg
        wants_imagenet = getattr(cfg, "dataset", None) == "imagenet" or (
            getattr(cfg, "dataset", None) is None
            and cfg.ndim == 2
            and os.path.isdir(os.path.join(cfg.dataset_path or "", "train"))
        )
        if wants_imagenet:
            # the 2D sibling's ImageNet path (reference SURFGAN_2D/main.py:
            # 66-103): class-folder JPEGs resized per phase.  Cached so the
            # file listing / scratch copy happens once across phases.
            from saragan_tpu.data.imagenet import imagenet_dataset_factory

            self.dataset_factory = imagenet_dataset_factory(
                cfg, cfg.dataset_path, num_classes=max(1, cfg.num_labels or 1)
            )
            return self.dataset_factory(phase)
        return get_numpy_dataset(
            phase,
            self.cfg.starting_phase,
            self.cfg.start_shape,
            self.cfg.dataset_path,
            self.cfg.scratch_path,
            verbose=self.verbose,
            # every process may copy (atomic-rename safe); nodes with their
            # own scratch populate it themselves instead of waiting on a
            # global rank 0 that lives on another node
            copy_files=self.cfg.scratch_path is not None,
            seed=self.cfg.seed,
        )

    def _restore_for_phase(self, phase: int, state: TrainState) -> TrainState:
        """Phase-chaining / continue_path restore (optuna_objective.py:334-354).

        continue_path semantics (reference parity): weights restored by name
        intersection, counters reset, alpha = --starting_alpha.  Extension
        beyond the reference: a `.pkl` continue_path (written by
        `full_state_checkpoints`) restores the ENTIRE TrainState including
        optimizer slots for exact mid-phase resume — the reference's
        tf.train.Saver only carried trainables, resetting Adam moments.
        """
        cfg = self.cfg
        restore_path = None
        if phase > cfg.starting_phase:
            restore_path = ckpt.phase_checkpoint_path(self.logdir, phase - 1)
        elif cfg.continue_path and phase == cfg.starting_phase:
            restore_path = cfg.continue_path
        if restore_path is None:
            self._log("Not restoring variables.")
            return state

        if restore_path.endswith(".pkl"):
            self._log(f"Restoring FULL train state (incl. optimizer) from: {restore_path}")
            full_state, counters = ckpt.load_full_state(restore_path)
            assert set(full_state.g_params) == set(state.g_params), (
                "full-state checkpoint is for a different phase/architecture"
            )
            self._resume_counters = counters
            if restore_path.endswith("_interrupt.pkl"):
                self._consumed_interrupt = restore_path
            # Seed the divergence rewind hint / prune protection from the
            # resume point: the resumed-from state trained finitely before
            # the save, and without a seed a divergence before the first
            # post-resume finite summary would raise with
            # last_checkpoint=None even though checkpoints exist (advisor
            # round-3 low finding).  The matching cadence .npz (written
            # alongside every full-state save) is the hintable artifact.
            npz_twin = re.sub(r"(_interrupt|_full)\.pkl$", ".npz", restore_path)
            self._seed_finite_checkpoint(
                npz_twin if os.path.exists(npz_twin) else restore_path, phase)
            return jax.tree_util.tree_map(jnp.asarray, full_state)

        self._log(f"Restoring variables from: {restore_path}")
        saved_params, _saved_ema, _meta = ckpt.load_params(restore_path)
        self._seed_finite_checkpoint(
            restore_path if restore_path.endswith(".npz") else restore_path + ".npz",
            phase)
        merged = {**state.g_params, **state.d_params}
        restored = ckpt.restore_into(merged, saved_params)
        g_params, d_params = split_params(restored)
        # EMA shadows re-seeded from restored live weights (utils.py:106-115).
        # Copies, not aliases: the state tree is donated across steps.
        ema = {k: jnp.copy(v) for k, v in restored.items()}
        return state._replace(g_params=g_params, d_params=d_params, ema=ema)

    def _prev_phase_names(self, phase: int) -> frozenset:
        if phase <= 1:
            return frozenset()
        prev = self.arch.init(jax.random.PRNGKey(self.cfg.seed), phase=phase - 1, cfg=self.cfg)
        return frozenset(prev.keys())

    def _handle_signal(self, signum, frame):
        """First SIGTERM/SIGINT: finish the in-flight step, checkpoint, exit
        (cfg.graceful_shutdown).  The flag is only checked AFTER a step
        completes — which can be minutes away (cold compile) or never (a
        wedged relay fetch) — so restore the previous handlers immediately:
        a SECOND signal takes its normal effect (KeyboardInterrupt / kill)
        instead of being swallowed."""
        import signal

        self._interrupt = signum
        for s, prev in self._installed_handlers.items():
            signal.signal(s, prev)
        self._installed_handlers = {}
        # os.write is async-signal-safe; print() is NOT — a reentrant call
        # into a buffered stdout writer (signal landing mid-write on a
        # verbose run) raises RuntimeError at the handler return point and
        # unwinds the loop WITHOUT the graceful checkpoint this feature
        # exists to write.
        os.write(
            2,
            (
                f"Received signal {signum}: finishing the in-flight step, "
                f"then writing an exact-resume checkpoint and exiting "
                f"(send again to terminate immediately)\n"
            ).encode(),
        )

    def _seed_finite_checkpoint(self, path: str, phase: int):
        """Seed the divergence rewind hint + prune protection from a resume
        point.  `phase` is the phase the checkpoint restores INTO (the
        --starting_phase the hint must name — see TrainingDiverged).

        Also seeds _last_checkpoint: the first post-resume finite summary
        executes `_last_finite_checkpoint = _last_checkpoint`, and before the
        first in-process cadence save that was None — so a finite-then-
        diverge sequence after resume (the common divergence shape) would
        CLOBBER this hint back to None and drop the resume point from the
        prune `protect` set (advisor round-4 medium finding).  The restored
        params derive from this checkpoint, so a later finite summary
        legitimately re-confirms it."""
        self._last_finite_checkpoint = path
        self._last_finite_checkpoint_phase = phase
        self._last_checkpoint = path
        self._last_checkpoint_phase = phase

    def _supersede_consumed_interrupt(self):
        """A newer full-state save just landed: the _interrupt.pkl an
        earlier restore consumed is now superseded — delete it so repeated
        preemptions never resurrect a stale resume point and its prune
        protection lapses (advisor round-3 high finding's cleanup arm).
        Deliberately deferred until a NEWER save exists: deleting at restore
        time would lose the only resume point if the requeued run dies
        before its first checkpoint."""
        if self._consumed_interrupt:
            try:
                os.remove(self._consumed_interrupt)
            except OSError:
                pass
            self._consumed_interrupt = None

    def _save_phase_checkpoint(self, phase: int, state: TrainState, global_step: int, step: Optional[int] = None):
        params = {**state.g_params, **state.d_params}
        path = ckpt.phase_checkpoint_path(self.logdir, phase, step)
        ckpt.save_params(path, params, ema=state.ema, meta={"global_step": global_step, "phase": phase})
        self._last_checkpoint = path + ".npz"
        self._last_checkpoint_phase = phase
        self._log(f"Writing checkpoint file: {os.path.basename(path)}")
        if step is not None and getattr(self.cfg, "keep_checkpoints", 0) > 0:
            # cadence saves only; the rewind hint's finite-confirmed
            # checkpoint stays on disk even when it ages out of the window
            ckpt.prune_cadence_checkpoints(
                self.logdir, phase, self.cfg.keep_checkpoints,
                protect={self._last_finite_checkpoint},
            )

    # ------------------------------------------------------------------

    def _make_eval_fns(self, phase: int):
        """Loss-eval (no grads) and sampling functions for summaries/metrics."""
        cfg = self.cfg
        arch = self.arch
        compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        def eval_losses(g_params, d_params, real, rng, alpha):
            gen_a = lambda p, z, k=None: arch.generator(p, z, alpha, phase=phase, cfg=cfg, rng=k)
            disc_a = lambda p, x: arch.discriminator(p, x, alpha, phase=phase, cfg=cfg)
            out = losses.forward_simultaneous(
                gen_a, disc_a, g_params, d_params, real.astype(compute_dtype), rng,
                latent_dim=cfg.latent_dim, loss_fn=cfg.loss_fn,
                gp_weight=cfg.gp_weight, noise_stddev=cfg.noise_stddev,
            )
            return out.gen_loss, out.disc_loss, out.gp_loss, out.gen_sample

        def sample(g_params, rng, n, alpha):
            k_z, k_g = jax.random.split(rng)
            z = jax.random.normal(k_z, (n, cfg.latent_dim), compute_dtype)
            return arch.generator(g_params, z, alpha, phase=phase, cfg=cfg, rng=k_g, train=False)

        return (
            aot_with_options(jax.jit(eval_losses), self._compiler_options),
            aot_with_options(
                jax.jit(sample, static_argnums=2), self._compiler_options, static_argnums=(2,)
            ),
        )

    # ------------------------------------------------------------------

    def run(self) -> Optional[float]:
        cfg = self.cfg
        if self._already_complete:
            self._log(
                f"auto_resume: model_{cfg.ending_phase or cfg.num_phases}.npz "
                f"already in {self.logdir} — training complete, nothing to do."
            )
            return self.last_fid
        if self._auto_resume_note:
            self._log(self._auto_resume_note)
        start_train = time.time()
        global_step = 0

        # graceful preemption (config.graceful_shutdown): catch SIGTERM/
        # SIGINT, let the in-flight step finish, checkpoint, raise
        # TrainingInterrupted.  Handlers are process-global so install only
        # from the main thread (HPO worker threads keep the default), and
        # restore the previous handlers on the way out.
        import signal
        import threading

        installed = {}
        if getattr(cfg, "graceful_shutdown", True) and (
            threading.current_thread() is threading.main_thread()
        ):
            for s in (signal.SIGTERM, signal.SIGINT):
                installed[s] = signal.signal(s, self._handle_signal)
            self._installed_handlers = installed

        try:
            for phase in range(cfg.starting_phase, cfg.num_phases + 1):
                self.phase = phase
                result = self._run_phase(phase, global_step)
                global_step = result.global_step
                if cfg.ending_phase and phase == cfg.ending_phase:
                    self._log("Reached final phase, breaking.")
                    break
                if self._interrupt is not None and phase < cfg.num_phases:
                    # a signal landed on this phase's FINAL step: the phase
                    # completed normally (EMA folded, model_<phase> written)
                    # instead of leaving a mid-phase resume point.  Resuming
                    # the NEXT phase from that checkpoint is exactly what an
                    # uninterrupted run does (_restore_for_phase loads
                    # model_<phase-1> at each new phase).
                    exc = TrainingInterrupted(self._last_checkpoint,
                                              phase + 1, global_step)
                    self._log(str(exc))
                    raise exc
        finally:
            for s, prev in installed.items():
                signal.signal(s, prev)
            self._installed_handlers = {}
            self.writer.flush()

        self.train_time = time.time() - start_train
        return self.last_fid

    # ------------------------------------------------------------------

    def _run_phase(self, phase: int, global_step: int) -> PhaseResult:
        cfg = self.cfg
        verbose = self.verbose
        global_size = self.global_size

        npy_data = self._get_dataset(phase)
        train_frac = 1 - (cfg.validation_fraction + cfg.test_fraction)
        n = len(npy_data)
        holdout = cfg.validation_fraction + cfg.test_fraction
        # the chained fraction splits must leave every side non-empty —
        # np.round's half-to-even can hand val or test 0 files on tiny
        # datasets, which split_by_fraction correctly refuses
        if holdout > 0:
            n_train = int(np.round(train_frac * n) + 1e-5)  # = split_by_fraction's math
            n_rest = n - n_train
            n_val = int(np.round((cfg.validation_fraction / holdout) * n_rest) + 1e-5)
            splittable = 0 < n_train < n and 0 < n_val < n_rest
        else:
            splittable = False
        if splittable:
            npy_train, npy_testval = npy_data.split_by_fraction(train_frac)
            npy_val, npy_test = npy_testval.split_by_fraction(
                cfg.validation_fraction / (cfg.validation_fraction + cfg.test_fraction)
            )
        else:
            # unsplit: give val/test their own draw state — sharing one
            # sample buffer with the train stream would race the prefetch
            # thread and desynchronize batch_sharded's shuffle stream
            npy_train = npy_data
            npy_val = npy_data.clone(seed_offset=1)
            npy_test = npy_data.clone(seed_offset=2)
        self._log(
            f"Split dataset of {len(npy_data)} samples: train {len(npy_train)}, "
            f"validation {len(npy_val)}, test {len(npy_test)}"
        )

        batch_size = cfg.batch_size_for_phase(phase, global_size)
        global_batch = batch_size * global_size
        self._log(f"Using local batch size of {batch_size} and global batch size of {global_batch}")

        # --- state ---
        rng = jax.random.PRNGKey(cfg.seed)
        state, (g_optimizer, d_optimizer) = init_train_state(self.arch, rng, phase=phase, cfg=cfg)
        state = self._restore_for_phase(phase, state)

        n_g = sum(int(v.size) for v in state.g_params.values())
        n_d = sum(int(v.size) for v in state.d_params.values())
        self._log(f"Generator parameters: {n_g}")
        self._log(f"Discriminator parameters: {n_d}")

        frozen = self._prev_phase_names(phase) if cfg.mixing_nimg > 0 else frozenset()
        step_mixing = make_train_step(
            self.arch, cfg, phase, g_optimizer, d_optimizer, frozen_names=frozen, freeze=bool(frozen)
        )
        # stabilizing steps run at alpha == 0 for the whole half-phase, so
        # alpha is bound statically: the models prune the transition
        # branches (to_rgb/from_rgb_{phase-1} + blend) — exact, measured
        # faster on-chip (BASELINE.md round 3)
        step_stab = make_train_step(
            self.arch, cfg, phase, g_optimizer, d_optimizer, static_alpha=0.0
        )
        lazy_k = max(1, int(getattr(cfg, "lazy_gp", 1)))
        if lazy_k > 1:
            # StyleGAN2 lazy regularization: GP only every k-th step
            step_mixing_nogp = make_train_step(
                self.arch, cfg, phase, g_optimizer, d_optimizer,
                frozen_names=frozen, freeze=bool(frozen), apply_gp=False,
            )
            step_stab_nogp = make_train_step(
                self.arch, cfg, phase, g_optimizer, d_optimizer, apply_gp=False,
                static_alpha=0.0,
            )
        batch_ndim = len(cfg.current_shape(phase, batch_size))
        # spatial (halo) sharding of the depth axis — and H on 'space2' when
        # the mesh carries that axis — for huge phases (§5.7)
        space_axis = (
            2
            if (self.mesh is not None and batch_ndim == 5
                and (self.mesh.shape.get("space", 1) > 1
                     or self.mesh.shape.get("space2", 1) > 1))
            else None
        )
        jit_mixing = jit_train_step(step_mixing, self.mesh, batch_ndim, donate=True, space_axis=space_axis, compiler_options=self._compiler_options)
        jit_stab = jit_train_step(step_stab, self.mesh, batch_ndim, donate=True, space_axis=space_axis, compiler_options=self._compiler_options)
        if lazy_k > 1:
            jit_mixing_nogp = jit_train_step(step_mixing_nogp, self.mesh, batch_ndim, donate=True, space_axis=space_axis, compiler_options=self._compiler_options)
            jit_stab_nogp = jit_train_step(step_stab_nogp, self.mesh, batch_ndim, donate=True, space_axis=space_axis, compiler_options=self._compiler_options)

        # histogram-emitting step variants, compiled lazily and used ONLY on
        # summary steps — per-variable histograms in the hot step measured
        # 887 vs 408 ms/step (see make_train_step)
        hist_steps = {}

        def hist_step_fn(mixing: bool, use_gp: bool):
            key = (mixing, use_gp)
            if key not in hist_steps:
                fn = make_train_step(
                    self.arch, cfg, phase, g_optimizer, d_optimizer,
                    frozen_names=frozen if mixing else frozenset(),
                    freeze=bool(frozen) and mixing,
                    apply_gp=use_gp, grad_histograms=True,
                    static_alpha=None if mixing else 0.0,
                )
                hist_steps[key] = jit_train_step(
                    fn, self.mesh, batch_ndim, donate=True, space_axis=space_axis,
                    compiler_options=self._compiler_options,
                )
            return hist_steps[key]

        eval_losses, sample_fn = self._make_eval_fns(phase)

        if self.mesh is not None:
            repl = replicated_sharding(self.mesh)
            state = jax.device_put(state, repl)

        # --- LR setup (reference optuna_objective.py:155-177) ---
        g_lr_max, d_lr_max = scale_lr(cfg.g_lr, cfg.d_lr, cfg.g_scaling, cfg.d_scaling, global_size)
        steps_per_phase = cfg.mixing_nimg + cfg.stabilizing_nimg
        # this run's img-count at which THIS phase began — the base of the
        # mixing-flip / phase-exit thresholds (reference
        # optuna_objective.py:564-576) and the rebase key full-state resume
        # subtracts (see _restore_for_phase).  One definition: every
        # full-state save below must store this exact value or resume
        # re-introduces the exit-after-one-step bug.
        phase_start_step = (phase - cfg.starting_phase) * steps_per_phase + self._step_offset

        # --- alpha ---
        alpha = float(cfg.starting_alpha) if phase == cfg.starting_phase else 1.0
        if cfg.mixing_nimg == 0:
            alpha = 0.0
        alpha_steps = max(1, cfg.mixing_nimg // global_batch) if cfg.mixing_nimg > 0 else 1
        alpha_delta = cfg.starting_alpha / alpha_steps

        mixing_bool = cfg.mixing_nimg > 0
        local_step = 0
        in_phase_step = 0
        # exact mid-phase resume from a full-state checkpoint
        resume = self.__dict__.pop("_resume_counters", None)
        if resume:
            alpha = float(resume.get("alpha", alpha))
            in_phase_step = int(resume.get("in_phase_step", 0))
            local_step = int(resume.get("local_step", 0))
            global_step = int(resume.get("global_step", global_step))
            # Rebase onto THIS run's schedule: the stored global_step is
            # cumulative from the ORIGINAL run's starting_phase, but the
            # mixing-flip / phase-exit thresholds below count from
            # cfg.starting_phase (reference optuna_objective.py:576 form).
            # Resuming phase P of a phase-1 run with --starting_phase P
            # would otherwise exit every remaining phase after one step.
            # The reconciliation moves the THRESHOLD BASE up rather than
            # global_step down: checkpoint filenames and the TB x-axis keep
            # the original cumulative numbering, so newest-by-step ranking
            # in find_auto_resume/prune_cadence_checkpoints stays correct
            # across repeated preemption (advisor round-3 high finding:
            # rebased-down numbering livelocked auto_resume under a second
            # preemption and made keep_checkpoints prune the freshest saves).
            stored_psp = int(resume.get("phase_start_step", 0))
            self._step_offset += stored_psp - phase_start_step
            phase_start_step = stored_psp
            mixing_bool = bool(resume.get("mixing", mixing_bool)) and cfg.mixing_nimg > 0
            # replay the uninterrupted run's batch sequence: completed steps
            # consumed exactly (local_step / batch_size) * global_batch paths
            # from the shared deterministic shuffle stream (prefetch
            # overshoot at interrupt time is NOT part of the counters, so
            # the fast-forward lands on the consumed position, not the
            # prefetched one).  Together with the fold_in step keys below
            # this makes a preempted+resumed run END-STATE IDENTICAL to an
            # uninterrupted one.
            if local_step and hasattr(npy_train, "fast_forward"):
                npy_train.fast_forward((local_step // batch_size) * global_batch)
            self._log(f"Resumed counters: step {global_step}, alpha {alpha}, mixing {mixing_bool}")
        # Per-step keys by fold_in(base, local_step), not a sequential split
        # carry: resume-invariant by construction (a resumed run derives the
        # SAME key for step i as the uninterrupted run), one tiny device op
        # per step either way.  Even salt = train step key, odd = summary
        # eval key (local_step increments by batch_size >= 1, so 2*l and
        # 2*l+1 never collide across steps).
        step_base = jax.random.PRNGKey(cfg.seed + phase * 1000)
        img_s = local_img_s = 0.0

        def full_state_counters():
            # reads the loop's live locals at call time — the ONE dict every
            # full-state save (periodic and interrupt) must agree on
            return {"global_step": global_step, "in_phase_step": in_phase_step,
                    "local_step": local_step, "alpha": alpha,
                    "mixing": mixing_bool, "phase": phase,
                    "phase_start_step": phase_start_step}

        # background prefetch of normalized batches. Multi-host: every
        # process draws from the same deterministic shuffle stream and loads
        # only its interleaved shard (exactly-once, no scatter — §5.8).
        nproc = jax.process_count()

        transfer_dtype = resolve_transfer_dtype(cfg)

        def make_batch():
            if nproc > 1:
                b = npy_train.batch_sharded(global_batch // nproc, nproc, jax.process_index())
            else:
                b = npy_train.batch(global_batch)
            return normalize_numpy(b, cfg.data_mean, cfg.data_stddev).astype(transfer_dtype)

        prefetcher = None
        if self.prefetch:
            # native prefetch executor (runtime/saragan_io.cc): a C++ worker
            # pool keeps batches in flight off the GIL; path selection (the
            # deterministic shuffle/shard stream) stays here.  Falls back to
            # the Python thread when the library isn't built or the dataset
            # isn't path-based.
            both = (cfg.data_mean is None) == (cfg.data_stddev is None)
            if (getattr(cfg, "native_prefetch", True) and both
                    and hasattr(npy_train, "batch_paths")
                    and getattr(npy_train, "shape", None) is not None):
                from saragan_tpu.data import native as native_io

                if nproc > 1:
                    pidx = jax.process_index()

                    def paths_fn():
                        return npy_train.batch_paths(global_batch)[pidx::nproc]
                else:
                    def paths_fn():
                        return npy_train.batch_paths(global_batch)

                prefetcher = native_io.make_native_prefetcher(
                    paths_fn, npy_train.shape, cfg.data_mean, cfg.data_stddev,
                    out_dtype=transfer_dtype,
                )
            if prefetcher is None:
                prefetcher = Prefetcher(make_batch)
        self._log(f"Begin mixing epochs in phase {phase}" if mixing_bool else f"Begin stabilizing epochs in phase {phase}")

        # jax.profiler trace of a few steady-state steps (SURVEY §5.1 —
        # strict upgrade over the reference's wall-clock-only telemetry)
        profile_steps = (5, 10) if cfg.profile_dir else None
        step_idx = 0

        # Windowed throughput: through the axon relay only VALUE FETCHES
        # block (CLAUDE.md hardware rules) — per-step block_until_ready
        # returns early and would time dispatch, not execution.  The window
        # closes at each summary step's float() fetch and excludes
        # summary/metric host time from the next window.
        window_t0 = time.time()
        window_imgs = 0

        try:
            while True:
                d_lr_val = lr_schedule(in_phase_step, steps_per_phase, d_lr_max,
                                       cfg.d_lr_increase, cfg.d_lr_decrease,
                                       cfg.d_lr_rise_niter, cfg.d_lr_decay_niter)
                g_lr_val = lr_schedule(in_phase_step, steps_per_phase, g_lr_max,
                                       cfg.g_lr_increase, cfg.g_lr_decrease,
                                       cfg.g_lr_rise_niter, cfg.g_lr_decay_niter)

                if not mixing_bool:
                    assert alpha == 0.0

                if global_step % cfg.checkpoint_every_nsteps < global_batch and local_step > 0:
                    self._save_phase_checkpoint(phase, state, global_step, step=global_step)
                    if cfg.full_state_checkpoints:
                        ckpt.save_full_state(
                            ckpt.phase_checkpoint_path(self.logdir, phase, global_step) + "_full",
                            state,
                            full_state_counters(),
                        )
                        self._supersede_consumed_interrupt()

                batch = next(prefetcher) if prefetcher else make_batch()
                if batch.dtype != transfer_dtype:  # native prefetch yields f32
                    batch = batch.astype(transfer_dtype)
                if self.mesh is not None:
                    batch = shard_global_batch(self.mesh, batch, space_axis)

                small_summary_bool = local_step % cfg.summary_small_every_nsteps < batch_size
                large_summary_bool = local_step % cfg.summary_large_every_nsteps < batch_size
                metrics_summary_bool = local_step % cfg.metrics_every_nsteps < batch_size

                if profile_steps and step_idx == profile_steps[0] and phase == cfg.starting_phase:
                    jax.profiler.start_trace(cfg.profile_dir)

                k = jax.random.fold_in(step_base, 2 * local_step)
                # lazy-GP cadence keyed on the step index DERIVED from
                # local_step (increments 1:1 with steps and rides
                # full_state_counters), so a preemption+resume with
                # cfg.lazy_gp > 1 keeps the GP application phase aligned
                # with the uninterrupted run (advisor round-4 low finding:
                # a loop-local counter reset to 0 on resume shifted it).
                use_gp = lazy_k == 1 or ((local_step // batch_size) % lazy_k == 0)
                want_hists = (
                    (small_summary_bool or large_summary_bool)
                    and self.verbose
                    and getattr(cfg, "grad_histograms", True)
                )
                if want_hists:
                    step_fn = hist_step_fn(mixing_bool, use_gp)
                elif use_gp:
                    step_fn = jit_mixing if mixing_bool else jit_stab
                else:
                    step_fn = jit_mixing_nogp if mixing_bool else jit_stab_nogp
                state, metrics = step_fn(state, batch, k, alpha, g_lr_val, d_lr_val)

                if profile_steps and step_idx == profile_steps[1] and phase == cfg.starting_phase:
                    jax.block_until_ready(metrics.gen_loss)
                    jax.profiler.stop_trace()
                if step_idx == 0:
                    # the first step's minutes of cold compile must not
                    # deflate the first throughput window (which feeds
                    # PhaseResult/HPO objectives); a value fetch is the only
                    # true completion barrier through the relay
                    _ = float(metrics.gen_loss)
                    window_t0 = time.time()
                    window_imgs = -global_batch  # cancel the += below
                step_idx += 1

                window_imgs += global_batch
                if small_summary_bool or large_summary_bool:
                    # ONE batched device_get of the whole metrics tree — the
                    # only true device sync through the relay; per-variable
                    # float() fetches would each be a round-trip (~100 of
                    # them on histogram steps).  This closes the window.
                    metrics = jax.device_get(metrics)
                    d_loss = float(metrics.disc_loss)
                    g_loss = float(metrics.gen_loss)
                    gp_loss = float(metrics.gp_loss)
                    if np.isfinite(d_loss) and np.isfinite(g_loss):
                        # the rewind hint must name a checkpoint KNOWN good:
                        # divergence is only observed on summary steps, but
                        # periodic checkpoints keep being written in between —
                        # the latest one may already hold NaN params.  Mark a
                        # checkpoint safe only once a LATER summary fetched
                        # finite losses from the params that followed it.
                        self._last_finite_checkpoint = self._last_checkpoint
                        self._last_finite_checkpoint_phase = self._last_checkpoint_phase
                    elif getattr(cfg, "abort_on_nonfinite", False):
                        raise TrainingDiverged(
                            phase, global_step, d_loss, g_loss,
                            self._last_finite_checkpoint,
                            self._last_finite_checkpoint_phase)
                    now = time.time()
                    # window_imgs == 0 on a step-0 summary (the post-compile
                    # reset above just zeroed it): keep the previous reading
                    # instead of reporting a spurious 0 img/s
                    if now > window_t0 and window_imgs > 0:
                        img_s = window_imgs / (now - window_t0)
                        local_img_s = img_s / global_size
                        self.last_img_s = img_s
                    self._write_summaries(
                        phase, state, metrics, npy_val, batch_size, global_step, alpha,
                        g_lr_val, d_lr_val, eval_losses, sample_fn,
                        jax.random.fold_in(step_base, 2 * local_step + 1),
                        large=large_summary_bool, mixing=mixing_bool,
                    )
                else:
                    d_loss = g_loss = None

                global_step += global_batch
                local_step += batch_size
                in_phase_step += global_batch

                if mixing_bool:
                    alpha = max(alpha - alpha_delta, 0.0)

                if metrics_summary_bool and cfg.calc_metrics and self.metrics_callback is not None:
                    self._run_metrics(phase, state, npy_val, sample_fn, global_step,
                                      in_phase_step, alpha)

                if small_summary_bool or large_summary_bool or metrics_summary_bool:
                    # summary/metric host time stays out of the next window
                    # (the reference offsets its speed measurement for the
                    # same reason, optuna_objective.py:439-440)
                    window_t0 = time.time()
                    window_imgs = 0

                if verbose and (small_summary_bool or large_summary_bool):
                    self.writer.scalar("img_s", img_s, global_step)
                    summ.print_summary_to_stdout(
                        global_step, in_phase_step, img_s, local_img_s,
                        d_loss, g_loss, d_lr_val, g_lr_val, alpha,
                    )

                # mixing -> stabilizing flip (optuna_objective.py:564-570)
                if mixing_bool and global_step >= phase_start_step + cfg.mixing_nimg:
                    mixing_bool = False
                    alpha = 0.0
                    self._log(f"Begin stabilizing epochs in phase {phase}")

                if mixing_bool:
                    assert alpha >= 0

                # phase exit (optuna_objective.py:576).  Evaluated BEFORE the
                # interrupt unwind: a signal landing on a phase's final step
                # must complete the phase (EMA fold + final checkpoint below),
                # not write a mid-phase resume point — resuming that would
                # re-enter the finished phase and train one extra step that an
                # uninterrupted run never has.  run() turns the still-set
                # interrupt flag into a phase-boundary TrainingInterrupted.
                phase_done = global_step >= phase_start_step + steps_per_phase

                # graceful preemption: the step above completed, counters are
                # advanced — save exactly what a loop-top periodic full-state
                # checkpoint would see next iteration, then unwind.  The .pkl
                # restores optimizer slots + counters via --continue_path.
                if self._interrupt is not None and not phase_done:
                    resume_path = ckpt.save_full_state(
                        ckpt.phase_checkpoint_path(self.logdir, phase, global_step)
                        + "_interrupt",
                        state,
                        full_state_counters(),
                    )
                    if resume_path != self._consumed_interrupt:
                        self._supersede_consumed_interrupt()
                    self._save_phase_checkpoint(phase, state, global_step,
                                                step=global_step)
                    self.state = state
                    exc = TrainingInterrupted(resume_path, phase, global_step)
                    self._log(str(exc))
                    raise exc

                if phase_done:
                    break
        finally:
            if prefetcher:
                prefetcher.stop()

        self._log("\n\n\n End of phase.")

        # Short phases (HPO trials) can end before any post-compile summary
        # window closed; measure the remaining window so PhaseResult (and any
        # train-speed HPO objective) carries a real throughput, not 0.
        if window_imgs > 0 and time.time() > window_t0:
            _ = float(metrics.gen_loss)  # completion barrier (relay rules)
            img_s = window_imgs / (time.time() - window_t0)
            self.last_img_s = img_s

        # final per-phase checkpoint with EMA folded in (:583-591)
        merged = {**state.g_params, **state.d_params}
        folded = fold_ema(merged, state.ema)
        g_f, d_f = split_params(folded)
        state = state._replace(g_params=g_f, d_params=d_f)
        self.state = state
        self._save_phase_checkpoint(phase, state, global_step)
        # the phase-final model_<p>.npz supersedes any consumed mid-phase
        # interrupt pkl (find_auto_resume already prefers completed phases)
        self._supersede_consumed_interrupt()

        # end-of-phase metrics under EMA weights (:597-629)
        if self.metrics_callback is not None and cfg.calc_metrics:
            for flag, ds, tag in (
                (cfg.compute_metrics_test, npy_test, "test"),
                (cfg.compute_metrics_validation, npy_val, "validation"),
                (cfg.compute_metrics_train, npy_train, "train"),
            ):
                if flag and len(ds) > 0:
                    m = self.metrics_callback(self, self._ema_sampler(state, sample_fn), ds,
                                              global_step, f"_{tag}")
                    self._log(f"{tag} dataset metrics: {m}")
                    if tag == "validation" and m and "FID" in m and m["FID"] is not None:
                        self.last_fid = float(m["FID"])

        return PhaseResult(phase, global_step, self.last_fid, img_s)

    # ------------------------------------------------------------------

    def _ema_sampler(self, state: TrainState, sample_fn):
        # Sample from the EMA tree itself — correct regardless of whether
        # fold_ema has already copied it into the live weights, so an
        # innocent reordering of _run_phase's tail can't silently ship
        # non-EMA samples to end-of-phase metrics (reference evaluates
        # end-of-phase metrics under EMA weights, optuna_objective.py:599).
        g_ema, _ = split_params(state.ema)

        def gen(rng, n, alpha=0.0):
            return np.asarray(sample_fn(g_ema, rng, n, alpha), np.float32)

        return gen

    def _run_metrics(self, phase, state, npy_val, sample_fn, global_step, in_phase_step, alpha):
        cfg = self.cfg

        def live_sampler(rng, n, a=alpha):
            return np.asarray(sample_fn(state.g_params, rng, n, a), np.float32)

        m = self.metrics_callback(self, live_sampler, npy_val, global_step, "")
        # EMA-weight metrics (reference :505-507)
        g_ema, _ = split_params(state.ema)

        def ema_sampler(rng, n, a=alpha):
            return np.asarray(sample_fn(g_ema, rng, n, a), np.float32)

        m_ema = self.metrics_callback(self, ema_sampler, npy_val, global_step, "_EMA")
        fid = (m or {}).get("FID")
        if fid is not None:
            self.last_fid = float(fid)
        # Never feed uncalibrated (random-feature) FID to the HPO pruner —
        # callbacks built by make_metrics_callback carry `fid_calibrated`.
        calibrated = getattr(self.metrics_callback, "fid_calibrated", True)
        if self.trial is not None and fid is not None and calibrated:
            self.trial.report(fid, global_step)
            if self.trial.should_prune() and in_phase_step > cfg.optuna_warmup_steps:
                raise TrialPruned()

    def _write_summaries(self, phase, state, metrics, npy_val, batch_size, global_step,
                         alpha, g_lr_val, d_lr_val, eval_losses, sample_fn, rng,
                         large: bool, mixing: bool):
        cfg = self.cfg
        if not self.verbose:
            return
        w = self.writer
        w.scalars(summ.training_props_summary(alpha, g_lr_val, d_lr_val), global_step)
        mem = summ.memory_summary()
        if mem:
            w.scalars(mem, global_step)
        suffix = "_freeze" if mixing and phase > cfg.starting_phase else ""
        w.scalars(
            summ.gradients_summary(float(metrics.max_g_norm), float(metrics.max_d_norm), suffix),
            global_step,
        )
        # per-variable gradient norms (scalars) + full histograms binned on
        # device (reference summary.py:83-87 per-var grad histograms)
        for tree in (metrics.g_norms, metrics.d_norms):
            if tree:
                w.scalars(
                    {f"grad_norm/{k}{suffix}": float(v) for k, v in tree.items()}, global_step
                )
        for tree in (metrics.g_hists, metrics.d_hists):
            if tree:
                for k, (counts, edges) in tree.items():
                    # reference scope: Loss/grad_{var} (summary.py:81-84)
                    w.histogram_raw(f"Loss/grad_{k}{suffix}", np.asarray(counts),
                                    np.asarray(edges), global_step)
        # small family: Loss/* + Image_properties/* (reference summary.py:27-57)
        if metrics.fake_min is not None:
            w.scalars(
                summ.small_summary(
                    metrics.disc_loss, metrics.gen_loss, metrics.gp_loss,
                    (float(metrics.fake_min), float(metrics.fake_max)),
                    (float(metrics.real_min), float(metrics.real_max)),
                ),
                global_step,
            )
        else:
            w.scalars(
                {
                    "Loss/d_loss": float(metrics.disc_loss),
                    "Loss/g_loss": float(metrics.gen_loss),
                    "Loss/gp": float(metrics.gp_loss),
                },
                global_step,
            )
        # validation losses on training weights + train losses on EMA weights
        if len(npy_val) > 0:
            val_batch = normalize_numpy(
                npy_val.batch(batch_size), cfg.data_mean, cfg.data_stddev
            ).astype(np.float32)
            # device copy ships at transfer dtype (bit-exact under bf16
            # compute — the eval fns cast to compute dtype first, like the
            # train step); the f32 host copy stays for image summaries
            val_dev = val_batch.astype(resolve_transfer_dtype(cfg), copy=False)
            k1, k2 = jax.random.split(rng)
            gl, dl, gpl, _ = jax.device_get(
                eval_losses(state.g_params, state.d_params, val_dev, k1, alpha)
            )
            w.scalars(
                {"Loss/d_loss_val": float(dl), "Loss/g_loss_val": float(gl),
                 "Loss/gp_val": float(gpl)},
                global_step,
            )
            g_ema, d_ema = split_params(state.ema)
            gl, dl, gpl, fake_ema = jax.device_get(
                eval_losses(g_ema, d_ema, val_dev, k2, alpha)
            )
            w.scalars(
                summ.small_summary(dl, gl, gpl, np.asarray(fake_ema, np.float32),
                                   val_batch, "_EMA"),
                global_step,
            )
            if large:
                # reference large-summary tags (summary.py:137-138)
                fake = np.asarray(fake_ema, np.float32)
                w.image("summaries/fake_image_EMA", summ.image_grid(fake), global_step)
                w.image("summaries/real_image", summ.image_grid(val_batch), global_step)
