"""Misc utilities — ports of reference utils.py helpers not already homed
elsewhere (SURVEY: parse_tuple/counters live in config/core; summaries in
train/summaries; LR scaling in optim/schedules)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from saragan_tpu.config import parse_tuple  # noqa: F401  (reference utils.py:339-341)
from saragan_tpu.core import param_count  # noqa: F401


def count_parameters(params: dict, scope: str = "") -> int:
    """reference utils.py:344-345."""
    return param_count(params, scope)


_compile_cache_enabled = False


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache (idempotent).

    Big-phase programs pay 5-8 cold-compile minutes each through the axon
    relay's remote compiler (phase 8: ~19 min train step + ~25 min sampler,
    BASELINE.md flagship table); the persistent cache amortizes that across
    bench runs, flagship legs, HPO trials of repeated architectures, and
    auto_resume requeues.  Default dir ~/.cache/saragan_jax_cache,
    overridable via env SARAGAN_COMPILE_CACHE (=0 disables).  Safe on any
    backend; returns the cache dir or None when disabled/unavailable.
    """
    global _compile_cache_enabled
    import os

    cache_dir = path or os.environ.get(
        "SARAGAN_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "saragan_jax_cache"),
    )
    if not cache_dir or cache_dir == "0":
        return None
    if _compile_cache_enabled:
        return cache_dir
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every real compile; the 1s floor skips only trivial programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None  # an optimization, never a failure
    _compile_cache_enabled = True
    return cache_dir


def get_num_metric_samples(num_metric_samples: Optional[int], batch_size: int, global_size: int) -> int:
    """reference utils.py:152-161."""
    if not num_metric_samples:
        return batch_size * global_size if batch_size > 1 else 2 * global_size
    return num_metric_samples


def get_verbosity(horovod: bool, optuna_distributed: bool) -> bool:
    """Only worker 0 prints under parallel runs (reference utils.py:251-265)."""
    if horovod or optuna_distributed:
        from saragan_tpu.hpo.harness import worker_id

        return worker_id() == 0
    return True


def print_study_summary(study):
    """reference utils.py:12-25."""
    print("Number of finished trials: ", len(study.trials))
    print("Best trial:")
    trial = study.best_trial
    print(" Value: ", trial.value)
    print(" Params: ")
    for key, value in trial.params.items():
        print(f"    {key}: {value}")


def dump_weight_for_debugging(params: dict, name: str = "generator/generator_in/dense/weight"):
    """Print the first element of a named parameter (reference utils.py:27-45)."""
    if name not in params:
        print(f"{name} is not in params")
        return
    v = np.asarray(params[name])
    label = name
    while v.ndim > 0:
        v = v[0]
        label = f"{label}[0]"
    print(f"{label}: {v}")


def uniform_box_sampler(arr, min_width, max_width, rng: Optional[np.random.Generator] = None):
    """Random box crop (reference utils.py:395-434; used by the SWD
    self-test battery)."""
    if rng is None:
        rng = np.random.default_rng()
    if isinstance(min_width, (tuple, list)):
        assert len(min_width) == arr.ndim
    else:
        min_width = (min_width,) * arr.ndim
    if isinstance(max_width, (tuple, list)):
        assert len(max_width) == arr.ndim
    else:
        max_width = (max_width,) * arr.ndim

    slices = []
    for dim, mn, mx in zip(arr.shape, min_width, max_width):
        start = int(rng.uniform(0, dim))
        stop = start + int(rng.uniform(mn, mx + 1))
        slices.append(slice(start, stop))
    return tuple(slices), arr[tuple(slices)]
