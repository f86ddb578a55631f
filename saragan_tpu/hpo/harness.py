"""HPO run-mode harness — rebuild of reference main.py:24-207.

Four run modes (main.py:36-42):

1. **normal**: one training run, no HPO (`objective(None, cfg)`);
2. **best-trial replay** (`optuna_use_best_trial`): load the study from
   storage, fix the best trial's params, run once (main.py:91-111);
3. **inter-trial** (`optuna_distributed`): N worker processes each run their
   own trials against one shared SQLite study; worker 0 creates the study,
   the rest wait for the DB file then load with a staggered delay to avoid
   the SQLite thundering herd (main.py:135-168, :150-157).  Worker identity
   comes from SARAGAN_WORKER_ID (or jax.process_index), per-worker logdirs
   as in reference utils.py:244-245;
4. **intra-trial**: data-parallel training *inside* each trial over the
   device mesh; with multiple JAX processes, only process 0 talks to the
   study and pruning decisions reach the others through the collective
   runtime (the reference's MPI bcast choreography, optuna_objective.py:
   519-541, collapses to nothing under a single controller).

Trial-level fault tolerance preserved: OOM-class errors are caught per
trial and the worker continues (main.py:32,163-165, gc_after_trial=True).
"""

from __future__ import annotations

import os
import time
from typing import Callable

from saragan_tpu import hpo
from saragan_tpu.config import Config


def _nproc() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:
        return 1


def worker_id() -> int:
    wid = os.environ.get("SARAGAN_WORKER_ID")
    if wid is not None:
        return int(wid)
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def make_sampler(cfg: Config, multi_objective: bool):
    """reference main.py:46-84."""
    s = hpo.samplers
    name = cfg.optuna_sampler
    # NSGAII/MOTPE are the (FID, train_time) multi-objective samplers and
    # nothing else is (is_multi_objective); a mismatch means the caller
    # passed inconsistent arguments
    assert multi_objective == (name in ("NSGAII", "MOTPE")), (name, multi_objective)
    if name == "random":
        return s.RandomSampler(seed=cfg.seed)
    if name == "TPE":
        return s.TPESampler(seed=cfg.seed, multivariate=cfg.optuna_TPE_multivariate)
    if name == "CMA":
        return s.CmaEsSampler(
            seed=cfg.seed,
            consider_pruned_trials=cfg.optuna_CMA_consider_pruned_trials,
            restart_strategy=cfg.optuna_CMA_restart_strategy,
            inc_popsize=cfg.optuna_CMA_inc_popsize,
        )
    if name == "NSGAII":
        return s.NSGAIISampler(seed=cfg.seed)
    if name == "MOTPE":
        return s.MOTPESampler(seed=cfg.seed)
    raise ValueError(f"Unknown sampler {name}")


def make_pruner(cfg: Config):
    p = hpo.pruners
    if cfg.optuna_pruner == "median":
        return p.MedianPruner(n_startup_trials=10)
    if cfg.optuna_pruner == "SHA":
        return p.SuccessiveHalvingPruner()
    if cfg.optuna_pruner == "nopruner":
        return p.NopPruner()
    raise ValueError(f"Unknown pruner {cfg.optuna_pruner}")


def is_multi_objective(cfg: Config) -> bool:
    """NSGAII/MOTPE optimize (FID, train_time) (reference main.py:44,139-143)."""
    return cfg.optuna_sampler in ("NSGAII", "MOTPE")


class FixedTrial:
    """Replays a frozen trial's params (best-trial mode, main.py:91-111).

    A missing param raises (Optuna's FixedTrial does too): silently
    substituting a distribution bound would replay a DIFFERENT config than
    the recorded best trial — e.g. a study created before a new
    hyperparameter was added to the search space."""

    def __init__(self, params):
        self.params = dict(params)
        self.number = -1

    def _get(self, name):
        if name not in self.params:
            raise KeyError(
                f"replayed trial has no value for {name!r}; the study "
                f"predates this parameter — pass --{name} on the CLI "
                f"(CLI values take precedence over frozen-trial values)"
            )
        return self.params[name]

    def suggest_float(self, name, low, high, **kw):
        return self._get(name)

    suggest_uniform = suggest_float

    def suggest_loguniform(self, name, low, high):
        return self._get(name)

    def suggest_int(self, name, low, high, step=1, **kw):
        return int(self._get(name))

    def suggest_categorical(self, name, choices):
        return self._get(name)

    def report(self, value, step):
        pass

    def should_prune(self):
        return False


# Error classes caught per-trial (reference main.py:32 catches the TF OOM
# family; the JAX/XLA equivalents are RuntimeError/XlaRuntimeError + OOM).
def _catchable() -> tuple:
    errs = [MemoryError]
    try:
        from jax.errors import JaxRuntimeError

        errs.append(JaxRuntimeError)
    except ImportError:
        errs.append(RuntimeError)
    return tuple(errs)


def default_objective(trial, cfg: Config):
    """objective(trial, cfg) -> FID (or (FID, train_time)): one full
    multi-phase training run (the reference's optuna_objective)."""
    from saragan_tpu.hpo.suggestions import optuna_override_undefined
    from saragan_tpu.metrics.save_metrics import make_metrics_callback
    from saragan_tpu.parallel import make_mesh
    from saragan_tpu.parallel.multihost import synchronized_trial
    from saragan_tpu.train.trainer import Trainer, TrialPruned as TrainerPruned

    if trial is not None or _nproc() > 1:
        # Multi-process lockstep: process 0 holds the real trial (trial is
        # None on the others); suggestions and prune decisions broadcast from
        # process 0 (reference optuna_objective.py:519-541) — so the override
        # below samples IDENTICAL params on every process.
        trial = synchronized_trial(trial)
    if trial is not None:
        cfg = optuna_override_undefined(cfg, trial)
    cfg = cfg.finalize()
    # None means "let the HPO trial pick it" (reference main.py:212-223);
    # in a normal run nothing fills these — fail with the remedy instead of
    # a mid-training TypeError (the reference crashes in tf.Variable(None)).
    for field in ("g_lr", "d_lr", "base_batch_size", "optimizer", "noise_stddev"):
        if getattr(cfg, field) is None:
            raise ValueError(
                f"--{field} is unset (None). Either pass --{field} explicitly or "
                f"run under HPO (--optuna_ntrials N) so the trial samples it."
            )
    if cfg.optuna_distributed:
        cfg.logdir = os.path.join(cfg.logdir or "runs", str(worker_id()))

    mesh = None
    if cfg.horovod:
        import jax

        mesh = make_mesh(num_data=cfg.num_data_shards, num_space=cfg.num_space_shards,
                         num_space2=cfg.num_space2_shards)

    def run_once(run_cfg, run_trial):
        metrics_cb = make_metrics_callback(run_cfg) if run_cfg.calc_metrics else None
        trainer = Trainer(run_cfg, mesh=mesh, metrics_callback=metrics_cb,
                          trial=run_trial,
                          verbose=(worker_id() == 0 or run_cfg.optuna_distributed))
        try:
            return trainer.run()
        except TrainerPruned:
            raise hpo.TrialPruned()

    start = time.time()
    k = int(getattr(cfg, "hpo_seeds", 1) or 1)
    if trial is None or k <= 1:
        fid = run_once(cfg, trial)
    else:
        # Variance-aware objective (VERDICT r4 item 3): the round-4 NAS
        # head-to-head measured per-config seed variance at ~7x the
        # architecture effect size, so a single-seed value is mostly draw
        # noise.  Train the SAME sampled config under k seeds and hand the
        # sampler the MEDIAN; pruning rides the first seed's trajectory
        # (reports/should_prune), later seeds train uninterrupted.
        import dataclasses
        import statistics

        vals = []
        for j in range(k):
            run_cfg = dataclasses.replace(
                cfg,
                seed=cfg.seed + 7919 * j,  # prime stride: disjoint streams
                logdir=os.path.join(cfg.logdir or "runs", f"seed{j}") if k > 1 else cfg.logdir,
            )
            vals.append(run_once(run_cfg, trial if j == 0 else None))
        if any(v is None for v in vals):
            # no objective computed (calc_metrics off) — mirror the
            # single-seed behavior instead of crashing on float(None)
            fid = None
        else:
            vals = [float(v) for v in vals]
            fid = statistics.median(vals)
            if hasattr(trial, "set_user_attr"):
                trial.set_user_attr("seed_values", vals)
                trial.set_user_attr("seed_spread", max(vals) - min(vals))
    if is_multi_objective(cfg):
        return fid, time.time() - start
    return fid


def run(cfg: Config, objective: Callable = default_objective):
    """Dispatch on run mode (reference main.py:24-207)."""
    multi = is_multi_objective(cfg)
    sampler = make_sampler(cfg, multi)
    pruner = make_pruner(cfg)

    if cfg.optuna_use_best_trial:
        assert cfg.optuna_storage and cfg.optuna_study_name
        study = hpo.load_study(study_name=cfg.optuna_study_name,
                               storage=cfg.optuna_storage,
                               sampler=sampler, pruner=pruner)
        best = study.best_trial
        print(f"Replaying best trial {best.number} with params {best.params}")
        return objective(FixedTrial(best.params), cfg)

    if cfg.optuna_distributed:
        wid = worker_id()
        storage = cfg.optuna_storage or "sqlite:///optuna_study.db"
        name = cfg.optuna_study_name or "saragan"
        kwargs = dict(directions=["minimize", "minimize"]) if multi else dict(direction="minimize")
        if wid == 0:
            study = hpo.create_study(study_name=name, storage=storage, sampler=sampler,
                                     pruner=pruner, load_if_exists=True, **kwargs)
        else:
            # wait for worker 0 to create the DB, staggered load
            # (main.py:150-157); the filesystem poll only makes sense for
            # sqlite — other RDB URLs rely on the stagger alone
            if storage.startswith("sqlite:///"):
                db_path = storage[len("sqlite:///"):]
                while not os.path.exists(db_path):
                    time.sleep(1)
            time.sleep(wid)
            study = hpo.load_study(study_name=name, storage=storage,
                                   sampler=sampler, pruner=pruner)
        n_trials = None
        if cfg.optuna_ntrials is not None:
            # ceil split across workers (main.py:159-160 divides by
            # hvd.size(); here the launcher exports SARAGAN_NUM_WORKERS —
            # without it each worker would run the FULL budget, so warn)
            env = os.environ.get("SARAGAN_NUM_WORKERS")
            if env is None and os.environ.get("SARAGAN_WORKER_ID") is not None:
                print("WARNING: SARAGAN_WORKER_ID is set but SARAGAN_NUM_WORKERS "
                      "is not — every worker will run the full --optuna_ntrials "
                      "budget instead of a 1/N share")
            nworkers = int(env or "1")
            n_trials = -(-cfg.optuna_ntrials // max(nworkers, 1))
        study.optimize(lambda t: objective(t, cfg), n_trials=n_trials,
                       timeout=cfg.optuna_walltime,
                       catch=_catchable(), gc_after_trial=True)
        return study

    if (cfg.optuna_ntrials is not None or cfg.optuna_storage is not None
            or cfg.optuna_walltime is not None):
        # intra-trial HPO: DP inside each trial, process 0 drives the study.
        # Under jax.process_count() > 1 the other processes run the SAME
        # number of trials against a local throwaway study — every suggested
        # param and prune decision reaches them via broadcast from process 0
        # (synchronized_trial in default_objective), so their own sampled
        # values are never used and never touch the shared storage
        # (reference main.py:183-205 rank-0 gating).
        storage = cfg.optuna_storage
        name = cfg.optuna_study_name or "saragan"
        kwargs = dict(directions=["minimize", "minimize"]) if multi else dict(direction="minimize")
        coordinator = True
        if _nproc() > 1:
            import jax

            coordinator = jax.process_index() == 0
        study = hpo.create_study(
            study_name=name,
            storage=storage if coordinator else None,
            sampler=sampler,
            pruner=pruner,
            load_if_exists=True,
            **kwargs,
        )
        if _nproc() > 1:
            # Lockstep trial loop: whether another trial starts is decided by
            # process 0 and broadcast — per-process wall clocks (or ntrials
            # bookkeeping) must never diverge, or the survivors hang in the
            # next collective (reference main.py:183-205 has rank 0 drive the
            # workers for exactly this reason).
            from saragan_tpu.parallel.multihost import broadcast_scalar

            start = time.time()
            i = 0
            while True:
                cont = False
                if coordinator:
                    cont = (cfg.optuna_ntrials is None or i < cfg.optuna_ntrials) and (
                        cfg.optuna_walltime is None
                        or time.time() - start < cfg.optuna_walltime
                    )
                if not bool(broadcast_scalar(float(cont))):
                    break
                study.optimize(lambda t: objective(t, cfg), n_trials=1,
                               catch=_catchable(), gc_after_trial=True)
                i += 1
            return study
        study.optimize(lambda t: objective(t, cfg), n_trials=cfg.optuna_ntrials,
                       timeout=cfg.optuna_walltime,
                       catch=_catchable(), gc_after_trial=True)
        return study

    # normal run
    return objective(None, cfg)
