"""Previous-phase variable freezing.

During the mixing sub-phase the reference trains with `train_gen_freeze` /
`train_disc_freeze`, which exclude all variables carried over from the
previous phase from the optimizer's var_list (reference
optimization.py:149-162, selected in the loop at optuna_objective.py:446-453).
Frozen variables receive neither parameter updates nor optimizer-slot
updates.

We reproduce that exactly by computing the full update and then re-selecting
the old value for every frozen leaf — in both the parameter tree and the
optimizer state (whose per-parameter slots are flat dicts keyed by the same
names).  XLA folds the select into the update kernel; there is no second
optimizer instance and no recompile between freeze/no-freeze beyond the two
variants the reference also builds.
"""

from __future__ import annotations

from typing import FrozenSet

import jax


def freeze_select(old_tree, new_tree, frozen_names: FrozenSet[str]):
    """Take `old` for any dict entry keyed by a frozen param name, else `new`.

    Works on params and on optimizer states: any pytree whose dict keys are
    full parameter names (e.g. optax's mu/nu trees over our flat param dicts)
    gets per-name selection; other leaves (step counters, ...) take `new`.
    """
    if not frozen_names:
        return new_tree

    def select(path, old_leaf, new_leaf):
        for entry in path:
            if isinstance(entry, jax.tree_util.DictKey) and entry.key in frozen_names:
                return old_leaf
        return new_leaf

    return jax.tree_util.tree_map_with_path(select, old_tree, new_tree)


def apply_freeze_names(params: dict, prev_params: dict) -> FrozenSet[str]:
    """Names to freeze = names already present in the previous phase
    (reference optuna_objective.py:200-202: prev_vars)."""
    return frozenset(k for k in params if k in prev_params)
