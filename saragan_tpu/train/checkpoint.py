"""Checkpointing with phase-chained, name-intersection partial restore.

Reproduces reference semantics (SURVEY §5.4):
* periodic `model_{phase}_ckpt_{global_step}` checkpoints;
* final per-phase `model_{phase}` with the EMA folded into the weights first
  (optuna_objective.py:583-591);
* restore = intersection of checkpoint names and current params, newly-grown
  layers keep their random init (utils.py:75-104);
* EMA shadows re-seeded from the restored live weights (utils.py:106-115).

Format: a single .npz per checkpoint holding the flat name->array param dict
with section prefixes ("params/", "ema/") plus scalar counters under
"meta/".  Flat names make intersection restore a dict operation; .npz keeps
checkpoints portable and dependency-free.  Optimizer slots are deliberately
NOT part of the phase chain (the reference's tf.train.Saver(var_list) only
saved trainables, so cross-phase resume resets optimizer moments); a
separate full-state save exists for exact mid-phase resume.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from saragan_tpu.core import Params, intersect_restore


def _to_numpy_tree(params: Params) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v) for k, v in params.items()}


def save_params(
    path: str,
    params: Params,
    ema: Optional[Params] = None,
    meta: Optional[Dict[str, float]] = None,
) -> str:
    """Save params (+ optional EMA and scalar meta) to `path`.npz."""
    out: Dict[str, np.ndarray] = {}
    for k, v in _to_numpy_tree(params).items():
        out[f"params/{k}"] = v
    if ema is not None:
        for k, v in _to_numpy_tree(ema).items():
            out[f"ema/{k}"] = v
    for k, v in (meta or {}).items():
        out[f"meta/{k}"] = np.asarray(v)
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **out)
    os.replace(tmp, path)
    return path


def load_params(path: str) -> Tuple[Params, Optional[Params], Dict[str, float]]:
    if not path.endswith(".npz"):
        path = path + ".npz"
    params, ema, meta = {}, {}, {}
    with np.load(path) as data:
        for k in data.files:
            if k.startswith("params/"):
                params[k[len("params/") :]] = data[k]
            elif k.startswith("ema/"):
                ema[k[len("ema/") :]] = data[k]
            elif k.startswith("meta/"):
                meta[k[len("meta/") :]] = float(data[k])
    return params, (ema or None), meta


def restore_into(
    current: Params,
    checkpoint_params: Params,
    strict: bool = False,
) -> Params:
    """Name-intersection restore; `strict=True` demands full coverage of the
    current tree (used for the continue_path try/except at
    optuna_objective.py:344-354)."""
    if strict:
        missing = [k for k in current if k not in checkpoint_params]
        if missing:
            raise KeyError(f"Checkpoint missing {len(missing)} params, e.g. {missing[:3]}")
    return intersect_restore(current, checkpoint_params)


def phase_checkpoint_path(logdir: str, phase: int, step: Optional[int] = None) -> str:
    name = f"model_{phase}" if step is None else f"model_{phase}_ckpt_{step}"
    return os.path.join(logdir, name)


def save_params_orbax(path: str, params: Params, ema: Optional[Params] = None) -> str:
    """Alternative backend: orbax PyTreeCheckpointer (SURVEY §5.4 suggested
    orbax; the npz format remains the default for its trivially-inspectable
    name-intersection restore). Directory-based."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    tree = {"params": {k: np.asarray(v) for k, v in params.items()}}
    if ema is not None:
        tree["ema"] = {k: np.asarray(v) for k, v in ema.items()}
    path = os.path.abspath(path)
    ckptr.save(path, tree, force=True)
    return path


def load_params_orbax(path: str) -> Tuple[Params, Optional[Params]]:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    return tree["params"], tree.get("ema")


def save_full_state(path: str, state, counters: Dict[str, float]) -> str:
    """Exact-resume save: entire TrainState (incl. optimizer slots) pickled
    with arrays converted to numpy. For mid-phase resume only."""
    host_state = jax.tree_util.tree_map(lambda x: np.asarray(x), state)
    if not path.endswith(".pkl"):
        path = path + ".pkl"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"state": host_state, "counters": counters}, f)
    os.replace(tmp, path)
    return path


def load_full_state(path: str):
    if not path.endswith(".pkl"):
        path = path + ".pkl"
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return blob["state"], blob["counters"]


def prune_cadence_checkpoints(logdir: str, phase: int, keep: int,
                              protect: Optional[set] = None) -> list:
    """Delete this phase's oldest cadence checkpoints beyond the newest
    `keep` steps (cfg.keep_checkpoints; 0 = keep everything, which is the
    reference's effective behavior — it builds a fresh tf.train.Saver per
    cadence save, optuna_objective.py:415-419, so max_to_keep never prunes
    across saves and multi-day runs accumulate unbounded checkpoints).

    A step is one retention unit: its `model_<p>_ckpt_<s>.npz` and
    `_full.pkl` go together.  Never touched: phase-final `model_<p>.npz`
    (different name shape), any step holding an `_interrupt.pkl` (the
    preemption resume point), and any path in `protect` (the trainer passes
    the divergence rewind hint's finite-confirmed checkpoint).
    Returns the deleted paths.
    """
    if keep <= 0 or not os.path.isdir(logdir):
        return []
    protect = {os.path.abspath(p) for p in (protect or set()) if p}
    steps: Dict[int, list] = {}
    interrupted = set()
    for f in os.listdir(logdir):
        m = _CKPT_NAME.match(f)
        if not m or int(m.group(1)) != phase or m.group(2) is None:
            continue
        step = int(m.group(2))
        if m.group(3) == "_interrupt":
            interrupted.add(step)
        else:
            steps.setdefault(step, []).append(os.path.join(logdir, f))
    deleted = []
    for step in sorted(steps)[:-keep] if len(steps) > keep else []:
        if step in interrupted:
            continue
        for path in steps[step]:
            if os.path.abspath(path) in protect:
                continue
            try:
                os.remove(path)
                deleted.append(path)
            except OSError:
                pass
    return deleted


class AutoResume:
    """Decision of `find_auto_resume`: where a requeued run should pick up."""

    __slots__ = ("continue_path", "starting_phase", "complete")

    def __init__(self, continue_path: Optional[str], starting_phase: int,
                 complete: bool = False):
        self.continue_path = continue_path
        self.starting_phase = starting_phase
        self.complete = complete


_CKPT_NAME = re.compile(
    r"^model_(\d+)(?:_ckpt_(\d+))?(_interrupt|_full)?\.(npz|pkl)$"
)


def find_auto_resume(logdir: str, ending_phase: int) -> Optional[AutoResume]:
    """Scan a logdir for the newest resume point (cfg.auto_resume).

    Preemption loop this enables: SIGTERM -> exit 75 (EX_TEMPFAIL) -> the
    scheduler requeues the SAME command line -> this picks up exactly where
    the interrupted run stopped, no flag edits.  The reference's SLURM .jb
    jobs were requeueable but restarted from scratch (no auto-restore
    anywhere in main.py); here nothing is lost.

    Ranking (newest training progress wins):
      1. a full-state .pkl (periodic `_full` or preemption `_interrupt`) of a
         phase no completed phase supersedes -> exact mid-phase resume;
      2. else the last completed phase's `model_<P>.npz` -> boundary resume
         into phase P+1, exactly what _restore_for_phase does between phases
         of an uninterrupted run;
      3. `model_<ending_phase>.npz` present -> training already complete;
      4. nothing recognizable -> None (fresh run).
    """
    if not logdir or not os.path.isdir(logdir):
        return None
    best_pkl = None  # ((phase, step, is_interrupt), filename)
    done = 0
    for f in sorted(os.listdir(logdir)):
        m = _CKPT_NAME.match(f)
        if not m:
            continue
        phase, step = int(m.group(1)), int(m.group(2) or 0)
        kind, ext = m.group(3), m.group(4)
        if ext == "pkl" and kind in ("_interrupt", "_full"):
            key = (phase, step, kind == "_interrupt")
            if best_pkl is None or key > best_pkl[0]:
                best_pkl = (key, f)
        elif ext == "npz" and kind is None and m.group(2) is None:
            done = max(done, phase)
    if done >= ending_phase:
        return AutoResume(None, ending_phase, complete=True)
    if best_pkl is not None and best_pkl[0][0] > done:
        return AutoResume(os.path.join(logdir, best_pkl[1]), best_pkl[0][0])
    if done > 0:
        return AutoResume(os.path.join(logdir, f"model_{done}.npz"), done + 1)
    return None
