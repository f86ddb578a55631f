"""Exponential moving average of parameters — reference ExtendedEMA.py.

The reference subclasses tf.train.ExponentialMovingAverage to add
backup/swap: evaluate with averaged weights, then restore the live ones
(ExtendedEMA.py:27-52).  Functionally the EMA is just a second parameter
tree, so "swap in EMA weights" is simply *using the other tree* — no
backup machinery needed.  The trainer keeps ``(params, ema_params)`` and:

* updates ``ema = decay * ema + (1 - decay) * params`` every step
  (tf.train.ExponentialMovingAverage with num_updates=None semantics;
  applied right after the train op, reference optuna_objective.py:467);
* evaluates validation summaries/metrics against ``ema_params``
  (reference :480-484, :505-507, :599-629);
* folds the EMA into the live weights before the final per-phase
  checkpoint (`fold_ema`, reference `ema_update_weights` :280-281, :585).
"""

from __future__ import annotations

import jax

from saragan_tpu.core import Params


def ema_init(params: Params) -> Params:
    """Shadow variables start at the current parameter values
    (tf.train.ExponentialMovingAverage.apply semantics).

    Materializes real copies — the shadow tree must not alias the live
    parameter buffers, or buffer donation of the TrainState would present
    the same buffer twice."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.copy, params)


def ema_update(ema: Params, params: Params, decay: float) -> Params:
    return jax.tree_util.tree_map(lambda e, p: decay * e + (1.0 - decay) * p, ema, params)


def fold_ema(params: Params, ema: Params) -> Params:
    """`ema_update_weights`: overwrite live weights with the averages."""
    return jax.tree_util.tree_map(lambda p, e: e, params, ema)


class ExtendedEMA:
    """Class-style API mirroring the reference's ExtendedEMA for users
    migrating code: apply/assign_ema_weights/restore_original_weights over a
    held (params, shadow) pair. The functional helpers above are the
    primitives; this is sugar."""

    def __init__(self, params: Params, decay: float):
        self.decay = decay
        self.shadow = ema_init(params)
        self._backup: Params | None = None

    def apply(self, params: Params) -> Params:
        """One EMA step; returns the params unchanged (chainable)."""
        self.shadow = ema_update(self.shadow, params, self.decay)
        return params

    def assign_ema_weights(self, params: Params) -> Params:
        """Back up live weights, return the averaged ones."""
        self._backup = params
        return fold_ema(params, self.shadow)

    def restore_original_weights(self) -> Params:
        assert self._backup is not None, "assign_ema_weights was not called"
        params, self._backup = self._backup, None
        return params

    def average(self, name: str):
        return self.shadow.get(name)
