"""Hyperparameter optimization (SURVEY C22/C23/C30).

The reference drives everything through Optuna.  Optuna is not available in
this environment, so `saragan_tpu.hpo.engine` provides an Optuna-compatible
study/trial/sampler/pruner engine with SQLite storage (multi-process
shareable, like the reference's SQLite study DB — README.md:31).  When a
real `optuna` package is importable it is used instead, transparently.
"""

try:  # pragma: no cover - depends on environment
    import optuna as _optuna

    create_study = _optuna.create_study
    load_study = _optuna.load_study
    TrialPruned = _optuna.TrialPruned
    samplers = _optuna.samplers
    pruners = _optuna.pruners
    USING_REAL_OPTUNA = True
except ImportError:
    from saragan_tpu.hpo.engine import (  # noqa: F401
        TrialPruned,
        create_study,
        load_study,
        pruners,
        samplers,
    )

    USING_REAL_OPTUNA = False

from saragan_tpu.hpo.suggestions import (  # noqa: F401
    get_predefined_lr_schedules,
    optuna_override_undefined,
)
