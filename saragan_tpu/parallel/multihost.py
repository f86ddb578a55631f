"""Multi-host (multi-process) HPO choreography.

The reference keeps Horovod workers in lockstep during hyper-parameter
optimization by MPI-broadcasting from rank 0 both the suggested trial
parameters and every prune decision
(/root/reference/SURFGAN_3D/optuna_objective.py:519-541 bcasts the prune
bool; main.py:183-205 gates study creation to rank 0).  Without that, each
rank would sample divergent params and prune independently — the surviving
ranks then hang in the next collective.

TPU-native equivalent: process 0 owns the study; every `suggest_*`,
`report` and `should_prune` goes through
`jax.experimental.multihost_utils.broadcast_one_to_all`, an ICI/DCN
collective over the global device set.  Single-process runs short-circuit to
plain pass-through (no collectives, zero overhead), so the same code path
serves tests and pods.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _nproc() -> int:
    import jax

    return jax.process_count()


def _is_coordinator() -> bool:
    import jax

    return jax.process_index() == 0


def broadcast_scalar(value: float) -> float:
    """Broadcast one float from process 0 to all processes (identity when
    single-process).  Non-zero processes may pass any placeholder.

    The float64 is shipped as its 8 raw bytes (uint8 survives the collective
    bit-exactly; a float array would be silently downcast to f32 under the
    default jax_enable_x64=False)."""
    if _nproc() == 1:
        return value
    from jax.experimental import multihost_utils

    buf = np.frombuffer(np.float64(value).tobytes(), np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return float(np.frombuffer(out.tobytes(), np.float64)[0])


def broadcast_json(obj, max_bytes: int = None):  # max_bytes kept for API compat, unused
    """Broadcast a JSON-serializable object from process 0.

    Two-phase: the byte length goes first (so every process allocates the
    same shape — broadcast_one_to_all requires identical shapes), then the
    exact-size payload.  No size cap, and a failure raises on every process
    instead of wedging the others inside the collective."""
    if _nproc() == 1:
        return obj
    import json

    from jax.experimental import multihost_utils

    raw = json.dumps(obj).encode("utf-8") if _is_coordinator() else b""
    n = int(broadcast_scalar(float(len(raw))))
    buf = np.zeros(n, np.uint8)
    if _is_coordinator():
        buf[:] = np.frombuffer(raw, np.uint8)
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return json.loads(buf.tobytes().decode("utf-8"))


class SynchronizedTrial:
    """Keeps HPO trials in lockstep across processes.

    Process 0 wraps the real trial; all other processes pass ``trial=None``.
    Every suggestion is decided on process 0 and broadcast, ``report`` only
    happens on process 0, and ``should_prune`` broadcasts process 0's
    decision so all processes raise TrialPruned on the same step (the
    reference's `if hvd.rank() == 0 ... bcast` pattern,
    optuna_objective.py:519-541).

    Works with both the built-in engine's trials and real Optuna trials —
    only the duck-typed suggest/report/should_prune surface is used.
    """

    def __init__(self, trial: Optional[object]):
        self._trial = trial
        self._coordinator = _is_coordinator()
        if self._coordinator and trial is None and _nproc() > 1:
            raise ValueError("process 0 must hold the real trial")
        self.number = broadcast_scalar(
            float(getattr(trial, "number", -1) if trial is not None else -1)
        )
        self.number = int(self.number)

    # -- suggest surface -------------------------------------------------

    def _sync(self, local_fn):
        value = local_fn() if self._coordinator else 0.0
        return broadcast_scalar(value)

    def suggest_float(self, name, low, high, **kw):
        return self._sync(lambda: self._trial.suggest_float(name, low, high, **kw))

    def suggest_uniform(self, name, low, high):
        return self._sync(lambda: self._trial.suggest_uniform(name, low, high))

    def suggest_loguniform(self, name, low, high):
        return self._sync(lambda: self._trial.suggest_loguniform(name, low, high))

    def suggest_int(self, name, low, high, step=1, **kw):
        # step is keyword-only in real Optuna >= 3
        return int(self._sync(lambda: self._trial.suggest_int(name, low, high, step=step, **kw)))

    def suggest_categorical(self, name, choices):
        choices = list(choices)
        idx = int(
            self._sync(lambda: choices.index(self._trial.suggest_categorical(name, choices)))
        )
        return choices[idx]

    # -- report / prune --------------------------------------------------

    @property
    def params(self):
        if self._coordinator:
            return getattr(self._trial, "params", {})
        return {}

    def report(self, value: float, step: int):
        if self._coordinator:
            self._trial.report(value, step)

    def should_prune(self) -> bool:
        decision = (
            float(self._trial.should_prune()) if self._coordinator else 0.0
        )
        return bool(broadcast_scalar(decision))


def synchronized_trial(trial) -> Optional[object]:
    """Wrap `trial` for lockstep HPO when multiple processes are present;
    pass-through otherwise (so single-process behavior — and its tests — are
    byte-identical).  Whether an HPO trial exists at all is itself decided by
    process 0 and broadcast, so a normal (no-HPO) multi-process run returns
    None everywhere without any per-process divergence."""
    if _nproc() == 1:
        return trial
    has_trial = bool(
        broadcast_scalar(float(trial is not None) if _is_coordinator() else 0.0)
    )
    if not has_trial:
        return None
    return SynchronizedTrial(trial)
