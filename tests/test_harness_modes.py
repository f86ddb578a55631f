"""HPO harness run-mode dispatch tests (reference main.py's 4 modes) with a
stub objective — fast, no training."""

import os

import pytest

from saragan_tpu.config import Config
from saragan_tpu.hpo import create_study, samplers
from saragan_tpu.hpo.harness import is_multi_objective, run, worker_id


def stub_objective_factory(calls):
    def objective(trial, cfg):
        value = 100.0
        if trial is not None:
            value = trial.suggest_float("x", 0, 10)
        calls.append((None if trial is None else getattr(trial, "number", -1), value))
        return value

    return objective


def test_normal_run_mode(tmp_path):
    calls = []
    cfg = Config(optuna_ntrials=None, optuna_storage=None)
    result = run(cfg, stub_objective_factory(calls))
    assert result == 100.0
    assert calls == [(None, 100.0)]


def test_intra_trial_mode(tmp_path):
    calls = []
    cfg = Config(
        optuna_ntrials=5,
        optuna_storage=f"sqlite:///{tmp_path}/study.db",
        optuna_study_name="s",
        optuna_sampler="random",
        optuna_pruner="nopruner",
    )
    study = run(cfg, stub_objective_factory(calls))
    assert len(calls) == 5
    assert len(study.trials) == 5
    assert study.best_trial.value == min(v for _, v in calls)


def test_inter_trial_mode(tmp_path, monkeypatch):
    monkeypatch.setenv("SARAGAN_WORKER_ID", "0")
    monkeypatch.setenv("SARAGAN_NUM_WORKERS", "2")
    monkeypatch.chdir(tmp_path)
    calls = []
    cfg = Config(
        optuna_distributed=True,
        optuna_ntrials=4,  # ceil(4/2) = 2 per worker
        optuna_storage=f"sqlite:///{tmp_path}/inter.db",
        optuna_study_name="s",
        optuna_sampler="random",
    )
    study = run(cfg, stub_objective_factory(calls))
    assert len(calls) == 2
    assert os.path.isfile(tmp_path / "inter.db")
    assert worker_id() == 0


def test_best_trial_replay(tmp_path):
    storage = f"sqlite:///{tmp_path}/replay.db"
    study = create_study(study_name="s", storage=storage,
                         sampler=samplers.RandomSampler(seed=0))
    study.optimize(lambda t: t.suggest_float("x", 0, 10), n_trials=5)
    best_x = study.best_trial.params["x"]

    calls = []

    def objective(trial, cfg):
        calls.append(trial.suggest_float("x", 0, 10))
        return 0.0

    cfg = Config(optuna_use_best_trial=True, optuna_storage=storage, optuna_study_name="s")
    run(cfg, objective)
    assert calls == [best_x]


def test_multi_objective_flag():
    assert is_multi_objective(Config(optuna_sampler="NSGAII"))
    assert is_multi_objective(Config(optuna_sampler="MOTPE"))
    assert not is_multi_objective(Config(optuna_sampler="TPE"))


def test_multi_objective_run(tmp_path):
    cfg = Config(
        optuna_sampler="NSGAII",
        optuna_ntrials=6,
        optuna_storage=f"sqlite:///{tmp_path}/mo.db",
        optuna_study_name="mo",
    )

    def objective(trial, c):
        x = trial.suggest_float("x", 0, 1)
        return x, 1 - x  # (FID, train_time)-style pair

    study = run(cfg, objective)
    assert len(study.best_trials) >= 1
    assert all(t.values is not None and len(t.values) == 2 for t in study.best_trials)


def test_walltime_bounded_trial_loop(tmp_path):
    """ntrials=None + --optuna_walltime keeps starting trials until the budget
    elapses (reference main.py:199-205 runs until SLURM walltime)."""
    import time

    calls = []

    def slow_objective(trial, cfg):
        time.sleep(0.02)
        return trial.suggest_float("x", 0, 10) if trial is not None else 100.0

    def counting(trial, cfg):
        calls.append(trial)
        return slow_objective(trial, cfg)

    cfg = Config(
        optuna_ntrials=None,
        # generous budget: under a loaded machine per-trial storage overhead
        # can reach hundreds of ms, and the assertion needs >= 2 trials
        optuna_walltime=3.0,
        optuna_storage=f"sqlite:///{tmp_path}/wt.db",
        optuna_study_name="wt",
        optuna_sampler="random",
        optuna_pruner="nopruner",
    )
    t0 = time.time()
    study = run(cfg, counting)
    elapsed = time.time() - t0
    # ran more than one trial, stopped soon after the budget, all were real trials
    assert len(calls) >= 2
    assert elapsed < 30.0
    assert all(t is not None for t in calls)
    assert len(study.trials) == len(calls)


def test_k_seed_objective_reports_median(tmp_path, monkeypatch):
    """hpo_seeds=3 (VERDICT r4 item 3): default_objective trains each
    trial's config under 3 seeds, hands the sampler the MEDIAN, stores the
    per-seed values in user_attrs, gives only the FIRST seed the live trial
    (pruning rides seed 0), and gives each seed its own logdir."""
    from saragan_tpu.hpo import harness
    from saragan_tpu.train import trainer as trainer_mod

    ran = []

    class StubTrainer:
        def __init__(self, cfg, mesh=None, metrics_callback=None, trial=None,
                     verbose=False):
            self.cfg, self.trial = cfg, trial

        def run(self):
            ran.append((self.cfg.seed, self.cfg.logdir, self.trial is not None))
            # seed-dependent objective: base + a deterministic "noise" term
            return float(self.cfg.seed % 7919) / 100.0 + self.cfg.g_lr

    monkeypatch.setattr(trainer_mod, "Trainer", StubTrainer)
    cfg = Config(
        optuna_ntrials=2,
        optuna_storage=f"sqlite:///{tmp_path}/ks.db",
        optuna_study_name="ks",
        optuna_sampler="random",
        optuna_pruner="nopruner",
        hpo_seeds=3,
        seed=42,
        g_lr=1e-3, d_lr=1e-3, base_batch_size=4, noise_stddev=0.0,
        logdir=str(tmp_path / "runs"),
    )
    study = harness.run(cfg)

    assert len(ran) == 6  # 2 trials x 3 seeds
    per_trial = [ran[:3], ran[3:]]
    for runs in per_trial:
        seeds = [r[0] for r in runs]
        assert seeds == [42, 42 + 7919, 42 + 2 * 7919]
        # only the first seed carries the live trial (pruning authority)
        assert [r[2] for r in runs] == [True, False, False]
        # distinct per-seed logdirs
        assert len({r[1] for r in runs}) == 3
    import statistics

    for t in study.trials:
        vals = t.user_attrs["seed_values"]
        assert len(vals) == 3
        assert t.value == statistics.median(vals)
        assert t.user_attrs["seed_spread"] == max(vals) - min(vals)
