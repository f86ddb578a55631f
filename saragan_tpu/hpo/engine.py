"""Optuna-compatible HPO engine.

Implements the subset of the Optuna API the reference uses (SURVEY C22):

* `create_study(study_name, storage, sampler, pruner, direction(s),
  load_if_exists)` / `load_study` with **SQLite storage** so multiple
  worker processes can share one study (the reference's inter-trial
  parallelism medium, main.py:135-168);
* `Trial.suggest_float/suggest_loguniform/suggest_int/suggest_categorical`,
  `report`, `should_prune`, `params`, `number`;
* samplers: Random, TPE (Parzen-estimator l/g ratio), CMA-ES (diagonal
  (mu, lambda) evolution strategy with optional ipop restarts), NSGA-II
  (non-dominated sorting + crowding, SBX crossover + polynomial mutation)
  and MOTPE (TPE on non-dominated split) — the five the reference's CLI
  selects between (main.py:46-84);
* pruners: Median (startup + warmup gates), SuccessiveHalving, Nop;
* `study.optimize(func, n_trials, catch, gc_after_trial)` and
  `study.best_trial` / `best_trials` (Pareto front for multi-objective).

Storage schema: one `trials` table holding JSON-encoded params /
distributions / intermediate values; WAL mode + busy timeout for concurrent
workers.
"""

from __future__ import annotations

import gc
import json
import math
import os
import random
import sqlite3
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

COMPLETE = "COMPLETE"
PRUNED = "PRUNED"
FAIL = "FAIL"
RUNNING = "RUNNING"


class TrialPruned(Exception):
    pass


# ---------------------------------------------------------------------------
# Storage
# ---------------------------------------------------------------------------


class _Storage:
    """SQLite-backed trial store. storage=None keeps everything in memory."""

    def __init__(self, url: Optional[str], study_name: str):
        self.study_name = study_name
        self._mem: List[dict] = []
        self.path = None
        if url:
            self.path = url[len("sqlite:///") :] if url.startswith("sqlite:///") else url
            d = os.path.dirname(os.path.abspath(self.path))
            os.makedirs(d, exist_ok=True)
            with self._conn() as c:
                c.execute(
                    "CREATE TABLE IF NOT EXISTS trials ("
                    "id INTEGER PRIMARY KEY AUTOINCREMENT, study TEXT, state TEXT,"
                    "params TEXT, dists TEXT, value TEXT, intermediate TEXT, ts REAL,"
                    "user_attrs TEXT DEFAULT '{}')"
                )
                try:  # migrate pre-round-5 DBs (no user_attrs column)
                    c.execute("ALTER TABLE trials ADD COLUMN user_attrs TEXT DEFAULT '{}'")
                except sqlite3.OperationalError:
                    pass  # column already exists
                c.execute(
                    "CREATE TABLE IF NOT EXISTS studies ("
                    "study TEXT PRIMARY KEY, directions TEXT)"
                )

    def set_directions(self, directions):
        if self.path is None:
            self._directions = list(directions)
            return
        with self._conn() as c:
            c.execute(
                "INSERT OR REPLACE INTO studies (study, directions) VALUES (?, ?)",
                (self.study_name, json.dumps(list(directions))),
            )

    def get_directions(self):
        if self.path is None:
            return getattr(self, "_directions", None)
        with self._conn() as c:
            row = c.execute(
                "SELECT directions FROM studies WHERE study = ?", (self.study_name,)
            ).fetchone()
        return json.loads(row[0]) if row else None

    def _conn(self):
        conn = sqlite3.connect(self.path, timeout=60)
        conn.execute("PRAGMA journal_mode=WAL")
        conn.execute("PRAGMA busy_timeout=60000")
        return conn

    def create_trial(self) -> int:
        if self.path is None:
            self._mem.append(
                {"state": RUNNING, "params": {}, "dists": {}, "value": None,
                 "intermediate": {}, "user_attrs": {}}
            )
            return len(self._mem) - 1
        with self._conn() as c:
            cur = c.execute(
                "INSERT INTO trials (study, state, params, dists, value, intermediate, ts)"
                " VALUES (?, ?, '{}', '{}', 'null', '{}', ?)",
                (self.study_name, RUNNING, time.time()),
            )
            return cur.lastrowid - 1

    def update_trial(self, number: int, **fields):
        if self.path is None:
            self._mem[number].update(fields)
            return
        sets, vals = [], []
        for k, v in fields.items():
            sets.append(f"{k} = ?")
            vals.append(
                json.dumps(v)
                if k in ("params", "dists", "value", "intermediate", "user_attrs")
                else v
            )
        vals.extend([self.study_name, number + 1])
        with self._conn() as c:
            c.execute(f"UPDATE trials SET {', '.join(sets)} WHERE study = ? AND id = ?", vals)

    def all_trials(self) -> List[dict]:
        if self.path is None:
            return [dict(t, number=i) for i, t in enumerate(self._mem)]
        with self._conn() as c:
            rows = c.execute(
                "SELECT id, state, params, dists, value, intermediate, user_attrs"
                " FROM trials WHERE study = ? ORDER BY id",
                (self.study_name,),
            ).fetchall()
        return [
            {
                "number": r[0] - 1,
                "state": r[1],
                "params": json.loads(r[2]),
                "dists": json.loads(r[3]),
                "value": json.loads(r[4]),
                "intermediate": {int(k): v for k, v in json.loads(r[5]).items()},
                "user_attrs": json.loads(r[6] or "{}"),
            }
            for r in rows
        ]


# ---------------------------------------------------------------------------
# Frozen / live trials
# ---------------------------------------------------------------------------


@dataclass
class FrozenTrial:
    number: int
    state: str
    params: Dict[str, Any]
    value: Optional[float] = None
    values: Optional[List[float]] = None
    intermediate_values: Dict[int, float] = field(default_factory=dict)
    dists: Dict[str, tuple] = field(default_factory=dict)
    user_attrs: Dict[str, Any] = field(default_factory=dict)

    @property
    def last_step(self):
        return max(self.intermediate_values) if self.intermediate_values else None


def _freeze(raw: dict) -> FrozenTrial:
    value = raw.get("value")
    values = None
    scalar = None
    if isinstance(value, list):
        values = value
        scalar = value[0] if value else None
    else:
        scalar = value
        values = [value] if value is not None else None
    return FrozenTrial(
        number=raw["number"],
        state=raw["state"],
        params=raw.get("params", {}),
        value=scalar,
        values=values,
        intermediate_values=raw.get("intermediate", {}),
        dists=raw.get("dists", {}),
        user_attrs=raw.get("user_attrs", {}),
    )


class Trial:
    def __init__(self, study: "Study", number: int):
        self.study = study
        self.number = number
        self.params: Dict[str, Any] = {}
        self._dists: Dict[str, tuple] = {}
        self._intermediate: Dict[int, float] = {}
        self.user_attrs: Dict[str, Any] = {}

    # -- suggest API ---------------------------------------------------

    def _suggest(self, name: str, dist: tuple):
        if name in self.params:
            return self.params[name]
        value = self.study.sampler.sample(self.study, name, dist, trial=self)
        self.params[name] = value
        self._dists[name] = dist
        self.study._storage.update_trial(self.number, params=self.params, dists=self._dists)
        return value

    def suggest_float(self, name, low, high, *, log=False, step=None):
        if step is not None:
            # floor, not round: low + n*step must stay <= high (Optuna clamps
            # the grid the same way) — round() could overshoot, e.g.
            # (0, 1, step=0.35) -> n=3 -> 1.05 > high.  The tolerance is
            # RELATIVE: with a wide range, FP error in (high-low)/step can
            # sit further than 1e-9 below an integer and an absolute epsilon
            # would drop the top grid point when the range divides exactly
            n = int((high - low) / step * (1 + 1e-12) + 1e-9)
            return self._suggest(name, ("discrete_float", low, step, n))
        return self._suggest(name, ("float_log" if log else "float", low, high))

    def suggest_uniform(self, name, low, high):
        return self.suggest_float(name, low, high)

    def suggest_loguniform(self, name, low, high):
        return self.suggest_float(name, low, high, log=True)

    def suggest_int(self, name, low, high, step=1, *, log=False):
        if log:
            return int(self._suggest(name, ("int_log", low, high, step)))
        return int(self._suggest(name, ("int", low, high, step)))

    def suggest_categorical(self, name, choices):
        return self._suggest(name, ("categorical", tuple(choices)))

    # -- report / prune ------------------------------------------------

    def report(self, value: float, step: int):
        self._intermediate[int(step)] = float(value)
        self.study._storage.update_trial(self.number, intermediate=self._intermediate)

    def set_user_attr(self, key: str, value):
        """Attach a JSON-serializable annotation (Optuna API); round-5 use:
        per-seed objective values under the k-seed option."""
        self.user_attrs[key] = value
        self.study._storage.update_trial(self.number, user_attrs=self.user_attrs)

    def should_prune(self) -> bool:
        return self.study.pruner.prune(self.study, self._frozen())

    def _frozen(self) -> FrozenTrial:
        return FrozenTrial(
            number=self.number,
            state=RUNNING,
            params=dict(self.params),
            intermediate_values=dict(self._intermediate),
        )


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------


def _dist_sample_random(rng: random.Random, dist: tuple):
    kind = dist[0]
    if kind == "float":
        return rng.uniform(dist[1], dist[2])
    if kind == "float_log":
        return math.exp(rng.uniform(math.log(dist[1]), math.log(dist[2])))
    if kind == "discrete_float":
        _, low, step, n = dist
        return low + step * rng.randint(0, n)
    if kind == "int":
        _, low, high, step = dist
        n = (high - low) // step
        return low + step * rng.randint(0, n)
    if kind == "int_log":
        _, low, high, step = dist
        v = math.exp(rng.uniform(math.log(low), math.log(high)))
        return min(low + step * int(round((v - low) / step)), high)
    if kind == "categorical":
        return rng.choice(list(dist[1]))
    raise ValueError(dist)


def _to_unit(value, dist):
    kind = dist[0]
    if kind == "float":
        lo, hi = dist[1], dist[2]
        return (value - lo) / (hi - lo + 1e-12)
    if kind == "float_log":
        lo, hi = math.log(dist[1]), math.log(dist[2])
        return (math.log(value) - lo) / (hi - lo + 1e-12)
    if kind == "int_log":
        lo, hi = math.log(dist[1]), math.log(dist[2])
        return (math.log(max(value, dist[1])) - lo) / (hi - lo + 1e-12)
    if kind in ("int", "discrete_float"):
        if kind == "int":
            _, low, high, step = dist
            return (value - low) / max(high - low, 1e-12)
        _, low, step, n = dist
        return (value - low) / max(step * n, 1e-12)
    if kind == "categorical":
        return list(dist[1]).index(value) / max(len(dist[1]) - 1, 1)
    raise ValueError(dist)


def _from_unit(u, dist):
    u = min(max(u, 0.0), 1.0)
    kind = dist[0]
    if kind == "float":
        return dist[1] + u * (dist[2] - dist[1])
    if kind == "float_log":
        lo, hi = math.log(dist[1]), math.log(dist[2])
        return math.exp(lo + u * (hi - lo))
    if kind == "int":
        _, low, high, step = dist
        n = (high - low) // step
        return low + step * int(round(u * n))
    if kind == "int_log":
        _, low, high, step = dist
        v = math.exp(math.log(low) + u * (math.log(high) - math.log(low)))
        return min(low + step * int(round((v - low) / step)), high)
    if kind == "discrete_float":
        _, low, step, n = dist
        return low + step * int(round(u * n))
    if kind == "categorical":
        choices = list(dist[1])
        return choices[int(round(u * (len(choices) - 1)))]
    raise ValueError(dist)


class RandomSampler:
    def __init__(self, seed: Optional[int] = None):
        self._rng = random.Random(seed)

    def sample(self, study, name, dist, trial=None):
        return _dist_sample_random(self._rng, dist)


class TPESampler:
    """Tree-structured Parzen Estimator.

    Default: independent per-parameter Parzen windows (Optuna's classic
    univariate TPE).  ``multivariate=True`` (the reference's
    --optuna_TPE_multivariate, main.py:62-66) switches to JOINT modelling:
    on the first suggest call of a trial, `n_ei_candidates` full parameter
    vectors are drawn from Gaussian kernels centered on complete *good*
    trials, scored by the joint l(x)/g(x) ratio (product kernels,
    log-sum-exp over mixture components), and the argmax vector is cached on
    the trial — so correlated parameters are proposed together rather than
    coordinate-wise."""

    def __init__(self, seed: Optional[int] = None, n_startup_trials: int = 10,
                 n_ei_candidates: int = 24, gamma: float = 0.25, multivariate: bool = False):
        self._rng = random.Random(seed)
        self.n_startup_trials = n_startup_trials
        self.n_ei_candidates = n_ei_candidates
        self.gamma = gamma
        self.multivariate = multivariate

    def _split(self, study, complete):
        sign = 1.0 if study.direction == "minimize" else -1.0
        ranked = sorted(complete, key=lambda t: sign * t.value)
        n_good = max(1, int(self.gamma * len(ranked)))
        return ranked[:n_good], ranked[n_good:]

    # -- joint (multivariate) path --------------------------------------

    def _sample_joint(self, study, complete) -> Dict[str, float]:
        good_t, bad_t = self._split(study, complete)
        dists: Dict[str, tuple] = {}
        for t in complete:
            dists.update(t.dists)
        names = sorted(dists)

        def vec(t):
            return {
                n: _to_unit(t.params[n], dists[n]) for n in names if n in t.params
            }

        good = [vec(t) for t in good_t]
        bad = [vec(t) for t in bad_t] or [{n: 0.5 for n in names}]
        bw = max(1.0 / max(len(good), 1) ** 0.5 * 0.2, 0.05)

        def log_mix(points, cand):
            # log of the mixture density with product kernels over shared dims
            comps = []
            for p in points:
                s = 0.0
                for n, x in cand.items():
                    if n in p:
                        s += -0.5 * ((x - p[n]) / bw) ** 2 - math.log(bw)
                comps.append(s)
            m = max(comps)
            return m + math.log(sum(math.exp(c - m) for c in comps) / len(comps) + 1e-300)

        best, best_score = None, -math.inf
        for _ in range(self.n_ei_candidates):
            base = self._rng.choice(good)
            cand = {
                n: min(max(base.get(n, 0.5) + self._rng.gauss(0, bw), 0.0), 1.0)
                for n in names
            }
            score = log_mix(good, cand) - log_mix(bad, cand)
            if score > best_score:
                best, best_score = cand, score
        return best

    # -- public ----------------------------------------------------------

    def sample(self, study, name, dist, trial=None):
        complete = [t for t in study.get_trials() if t.state == COMPLETE and name in t.params
                    and t.value is not None]
        if len(complete) < self.n_startup_trials:
            return _dist_sample_random(self._rng, dist)

        if self.multivariate and trial is not None:
            cache = getattr(trial, "_tpe_joint", None)
            if cache is None:
                # Joint model over ALL completed trials — `complete` above is
                # filtered by the first-queried name, which would silently
                # drop trials missing that one param from the joint density
                # of every other param (conditional / extended spaces).
                all_complete = [t for t in study.get_trials()
                                if t.state == COMPLETE and t.value is not None]
                cache = self._sample_joint(study, all_complete)
                trial._tpe_joint = cache
            if name in cache:
                return _from_unit(cache[name], dist)
            # params never seen jointly fall through to the univariate path

        good_t, bad_t = self._split(study, complete)
        good = [_to_unit(t.params[name], dist) for t in good_t]
        bad = [_to_unit(t.params[name], dist) for t in bad_t] or [0.5]

        bw = max(1.0 / max(len(good), 1) ** 0.5 * 0.2, 0.05)

        def kde(points, x):
            return sum(math.exp(-0.5 * ((x - p) / bw) ** 2) for p in points) / (len(points) * bw)

        best_x, best_score = None, -math.inf
        for _ in range(self.n_ei_candidates):
            base = self._rng.choice(good)
            x = min(max(base + self._rng.gauss(0, bw), 0.0), 1.0)
            score = math.log(kde(good, x) + 1e-12) - math.log(kde(bad, x) + 1e-12)
            if score > best_score:
                best_x, best_score = x, score
        return _from_unit(best_x, dist)


class CmaEsSampler:
    """Full CMA-ES over the unit cube (Hansen's (mu/mu_w, lambda)-CMA-ES:
    CSA step-size control, evolution paths p_sigma/p_c, rank-1 + rank-mu
    covariance updates), reconstructed deterministically from study history.

    The sampler is storage-backed and stateless across processes: each joint
    draw replays the finished trials (sorted by number, chunked into
    generations of ``popsize``) through the standard CMA update equations.
    Because the updates consume the *actually evaluated* points (wherever
    they came from — the random startup, another worker's slightly stale
    state), this is CMA-ES with injected solutions, and every worker
    reconstructs the same shared state from the same storage.  Parameters
    map to [0, 1] via their distributions (log dims in log space); names
    absent from history fall back to an independent random draw.

    ``restart_strategy='ipop'`` restarts with ``inc_popsize``x the
    population when the step size collapses or a generation's fitness is
    flat (IPOP-CMA-ES), re-centered on the best point seen so far.

    Replaces the round-2 elite-covariance (mu, lambda)-ES (VERDICT r2
    weak #4: no evolution paths / step-size adaptation).  Reference sampler
    selection: main.py:46-84.
    """

    _SIGMA0 = 0.3  # initial step size: N(0.5, 0.3^2) roughly covers [0, 1]

    def __init__(self, seed: Optional[int] = None, n_startup_trials: int = 8,
                 consider_pruned_trials: bool = False, restart_strategy: Optional[str] = None,
                 inc_popsize: int = 2, popsize: Optional[int] = None):
        self._rng = random.Random(seed)
        self._np_rng = np.random.default_rng(seed)
        self.n_startup_trials = n_startup_trials
        self.consider_pruned = consider_pruned_trials
        self.restart_strategy = restart_strategy
        self.inc_popsize = inc_popsize
        self.popsize = popsize

    def _done(self, study, name=None):
        states = (COMPLETE, PRUNED) if self.consider_pruned else (COMPLETE,)
        return [t for t in study.get_trials() if t.state in states and t.value is not None
                and (name is None or name in t.params)]

    # -- state replay ---------------------------------------------------

    @staticmethod
    def _weights(lam: int, d: int):
        """Standard CMA constants for population lam in dimension d."""
        mu = lam // 2
        w = np.log((lam + 1) / 2.0) - np.log(np.arange(1, mu + 1))
        w = w / w.sum()
        mu_eff = 1.0 / float(np.sum(w**2))
        c_sigma = (mu_eff + 2.0) / (d + mu_eff + 5.0)
        d_sigma = 1.0 + 2.0 * max(0.0, math.sqrt((mu_eff - 1.0) / (d + 1.0)) - 1.0) + c_sigma
        c_c = (4.0 + mu_eff / d) / (d + 4.0 + 2.0 * mu_eff / d)
        c_1 = 2.0 / ((d + 1.3) ** 2 + mu_eff)
        c_mu = min(1.0 - c_1, 2.0 * (mu_eff - 2.0 + 1.0 / mu_eff) / ((d + 2.0) ** 2 + mu_eff))
        chi_n = math.sqrt(d) * (1.0 - 1.0 / (4.0 * d) + 1.0 / (21.0 * d**2))
        return mu, w, mu_eff, c_sigma, d_sigma, c_c, c_1, c_mu, chi_n

    def _replay(self, study, done):
        """Replay history through the CMA update equations.

        Returns (mean, sigma, eigvecs B, sqrt-eigvals D, names) — enough to
        draw x = m + sigma * B (D*z).  Deterministic in (history, popsize):
        concurrent workers agree on the state without shared memory.
        """
        sign = 1.0 if study.direction == "minimize" else -1.0
        ordered = sorted(done, key=lambda t: t.number)
        dists: Dict[str, tuple] = {}
        for t in ordered:
            dists.update(t.dists)
        names = sorted(dists)
        d = max(len(names), 1)
        lam = self.popsize or (4 + int(3 * math.log(max(d, 2))))
        lam = max(lam, 4)

        m = np.full(d, 0.5)
        sigma = self._SIGMA0
        C = np.eye(d)
        p_sigma = np.zeros(d)
        p_c = np.zeros(d)
        gen = 0
        best_x, best_f = None, math.inf
        B, D = np.eye(d), np.ones(d)

        def _eigen(C):
            C = (C + C.T) / 2.0
            vals, vecs = np.linalg.eigh(C)
            vals = np.maximum(vals, 1e-20)
            return vecs, np.sqrt(vals)

        i = 0
        while i + lam <= len(ordered):
            batch = ordered[i:i + lam]
            i += lam
            mu, w, mu_eff, c_sigma, d_sigma, c_c, c_1, c_mu, chi_n = self._weights(lam, d)
            xs = np.array([
                [_to_unit(t.params[n], dists[n]) if n in t.params else m[j]
                 for j, n in enumerate(names)]
                for t in batch
            ])
            fs = np.array([sign * t.value for t in batch])
            order = np.argsort(fs, kind="stable")
            if fs[order[0]] < best_f:
                best_f = float(fs[order[0]])
                best_x = xs[order[0]].copy()

            ys = (xs[order[:mu]] - m) / sigma
            y_w = w @ ys
            m = m + sigma * y_w

            # B, D always hold the decomposition of the CURRENT C on entry
            # (init, end of the previous generation, or restart)
            c_inv_sqrt_yw = B @ ((B.T @ y_w) / D)
            p_sigma = (1.0 - c_sigma) * p_sigma + math.sqrt(
                c_sigma * (2.0 - c_sigma) * mu_eff) * c_inv_sqrt_yw
            gen += 1
            ps_norm = float(np.linalg.norm(p_sigma))
            denom = math.sqrt(1.0 - (1.0 - c_sigma) ** (2 * gen))
            h_sigma = 1.0 if ps_norm / denom < (1.4 + 2.0 / (d + 1.0)) * chi_n else 0.0
            p_c = (1.0 - c_c) * p_c + h_sigma * math.sqrt(
                c_c * (2.0 - c_c) * mu_eff) * y_w
            delta_h = (1.0 - h_sigma) * c_c * (2.0 - c_c)
            rank_mu = (ys * w[:, None]).T @ ys
            C = ((1.0 - c_1 - c_mu) * C
                 + c_1 * (np.outer(p_c, p_c) + delta_h * C)
                 + c_mu * rank_mu)
            sigma = sigma * math.exp((c_sigma / d_sigma) * (ps_norm / chi_n - 1.0))
            sigma = float(min(max(sigma, 1e-10), 10.0))
            B, D = _eigen(C)

            # IPOP restart: step size collapsed or the generation's fitness
            # is flat (converged/stagnated) -> larger population, fresh
            # state centered on the best point seen (Auger & Hansen 2005)
            flat = float(fs.max() - fs.min()) < 1e-14
            collapsed = sigma * float(D.max()) < 1e-5 or float(D.max() / D.min()) > 1e14
            if self.restart_strategy == "ipop" and (flat or collapsed):
                lam *= self.inc_popsize
                m = best_x.copy() if best_x is not None else np.full(d, 0.5)
                sigma = self._SIGMA0
                C = np.eye(d)
                p_sigma = np.zeros(d)
                p_c = np.zeros(d)
                gen = 0
                B, D = np.eye(d), np.ones(d)

        return m, sigma, B, D, names

    def _sample_joint(self, study, done) -> Dict[str, float]:
        m, sigma, B, D, names = self._replay(study, done)
        z = self._np_rng.standard_normal(len(m))
        draw = m + sigma * (B @ (D * z))
        return {n: float(min(max(v, 0.0), 1.0)) for n, v in zip(names, draw)}

    def sample(self, study, name, dist, trial=None):
        done = self._done(study, name)
        if len(done) < self.n_startup_trials:
            return _dist_sample_random(self._rng, dist)
        # One joint draw per trial (cached on the trial); direct sample()
        # calls without a trial get an uncached joint draw.
        cache = getattr(trial, "_cma_joint", None) if trial is not None else None
        if cache is None:
            cache = self._sample_joint(study, self._done(study))
            if trial is not None:
                trial._cma_joint = cache
        if name in cache:
            return _from_unit(cache[name], dist)
        return _dist_sample_random(self._rng, dist)  # name absent from history


def _dominates(a: Sequence[float], b: Sequence[float], directions: Sequence[str]) -> bool:
    signs = [1.0 if d == "minimize" else -1.0 for d in directions]
    av = [s * x for s, x in zip(signs, a)]
    bv = [s * x for s, x in zip(signs, b)]
    return all(x <= y for x, y in zip(av, bv)) and any(x < y for x, y in zip(av, bv))


def _pareto_front(trials: List[FrozenTrial], directions) -> List[FrozenTrial]:
    front = []
    for t in trials:
        if t.values is None:
            continue
        if not any(
            o is not t and o.values is not None and _dominates(o.values, t.values, directions)
            for o in trials
        ):
            front.append(t)
    return front


def _non_dominated_sort(trials: List[FrozenTrial], directions) -> List[List[FrozenTrial]]:
    """Fast non-dominated sort (Deb et al. 2002): fronts[0] is the Pareto
    front, fronts[k] dominates only fronts[>k]."""
    pool = [t for t in trials if t.values is not None]
    dominated_by: Dict[int, int] = {id(t): 0 for t in pool}
    dominates_set: Dict[int, List[FrozenTrial]] = {id(t): [] for t in pool}
    for a in pool:
        for b in pool:
            if a is b:
                continue
            if _dominates(a.values, b.values, directions):
                dominates_set[id(a)].append(b)
                dominated_by[id(b)] += 1
    fronts: List[List[FrozenTrial]] = []
    current = [t for t in pool if dominated_by[id(t)] == 0]
    while current:
        fronts.append(current)
        nxt = []
        for a in current:
            for b in dominates_set[id(a)]:
                dominated_by[id(b)] -= 1
                if dominated_by[id(b)] == 0:
                    nxt.append(b)
        current = nxt
    return fronts


def _crowding_distance(front: List[FrozenTrial]) -> Dict[int, float]:
    """Per-trial crowding distance within one front (Deb et al. 2002)."""
    crowd = {id(t): 0.0 for t in front}
    if len(front) <= 2:
        return {k: math.inf for k in crowd}
    n_obj = len(front[0].values)
    for k in range(n_obj):
        ordered = sorted(front, key=lambda t: t.values[k])
        lo, hi = ordered[0].values[k], ordered[-1].values[k]
        crowd[id(ordered[0])] = math.inf
        crowd[id(ordered[-1])] = math.inf
        span = hi - lo
        if span <= 0:
            continue
        for j in range(1, len(ordered) - 1):
            crowd[id(ordered[j])] += (ordered[j + 1].values[k] - ordered[j - 1].values[k]) / span
    return crowd


class NSGAIISampler:
    """NSGA-II (Deb et al. 2002): environmental selection by non-dominated
    sort + crowding distance over the finished trials, binary-tournament
    parent choice, and SBX crossover + polynomial mutation of the JOINT
    parameter vector — one child per trial, cached, so correlated
    parameters recombine together.

    Replaces the round-2 per-parameter front-blend sampler (VERDICT r2
    weak #4: non-generational single-child sampling).  Reference sampler
    selection: main.py:46-84 (multi-objective (FID, train_time),
    main.py:44,139-143)."""

    def __init__(self, seed: Optional[int] = None, n_startup_trials: int = 10,
                 mutation_prob: Optional[float] = None, population_size: int = 20,
                 crossover_eta: float = 10.0, mutation_eta: float = 20.0):
        self._rng = random.Random(seed)
        self.n_startup_trials = n_startup_trials
        self.mutation_prob = mutation_prob  # None -> 1/d (Deb's default)
        self.population_size = population_size
        self.crossover_eta = crossover_eta
        self.mutation_eta = mutation_eta

    # -- NSGA-II machinery ---------------------------------------------

    def _select_population(self, done, directions):
        """Elitist environmental selection: fill from successive fronts,
        truncate the last front by crowding distance.  Returns
        (population, rank map, crowding map)."""
        fronts = _non_dominated_sort(done, directions)
        pop: List[FrozenTrial] = []
        rank: Dict[int, int] = {}
        crowd: Dict[int, float] = {}
        for r, front in enumerate(fronts):
            c = _crowding_distance(front)
            crowd.update(c)
            for t in front:
                rank[id(t)] = r
            if len(pop) + len(front) <= self.population_size:
                pop.extend(front)
            else:
                keep = sorted(front, key=lambda t: -c[id(t)])[: self.population_size - len(pop)]
                pop.extend(keep)
                break
            if len(pop) >= self.population_size:
                break
        return pop, rank, crowd

    def _tournament(self, pop, rank, crowd):
        a, b = self._rng.choice(pop), self._rng.choice(pop)
        ka = (rank[id(a)], -crowd[id(a)])
        kb = (rank[id(b)], -crowd[id(b)])
        return a if ka <= kb else b

    def _sbx(self, u1: float, u2: float) -> float:
        """Simulated binary crossover (one child) in [0, 1]."""
        if abs(u1 - u2) < 1e-14:
            return u1
        r = self._rng.random()
        if r <= 0.5:
            beta = (2.0 * r) ** (1.0 / (self.crossover_eta + 1.0))
        else:
            beta = (1.0 / (2.0 * (1.0 - r))) ** (1.0 / (self.crossover_eta + 1.0))
        if self._rng.random() < 0.5:
            child = 0.5 * ((1.0 + beta) * u1 + (1.0 - beta) * u2)
        else:
            child = 0.5 * ((1.0 - beta) * u1 + (1.0 + beta) * u2)
        return min(max(child, 0.0), 1.0)

    def _poly_mutate(self, u: float) -> float:
        """Polynomial mutation in [0, 1]."""
        r = self._rng.random()
        if r < 0.5:
            delta = (2.0 * r) ** (1.0 / (self.mutation_eta + 1.0)) - 1.0
            child = u + delta * u
        else:
            delta = 1.0 - (2.0 * (1.0 - r)) ** (1.0 / (self.mutation_eta + 1.0))
            child = u + delta * (1.0 - u)
        return min(max(child, 0.0), 1.0)

    def _make_child(self, study, done) -> Dict[str, float]:
        pop, rank, crowd = self._select_population(done, study.directions)
        p1 = self._tournament(pop, rank, crowd)
        p2 = self._tournament(pop, rank, crowd)
        dists: Dict[str, tuple] = {}
        for t in done:
            dists.update(t.dists)
        names = sorted(set(p1.params) | set(p2.params))
        d = max(len(names), 1)
        mut_prob = self.mutation_prob if self.mutation_prob is not None else 1.0 / d
        child: Dict[str, float] = {}
        for n in names:
            if n in p1.params and n in p2.params:
                u1 = _to_unit(p1.params[n], dists[n])
                u2 = _to_unit(p2.params[n], dists[n])
                u = self._sbx(u1, u2) if self._rng.random() < 0.9 else u1
            else:
                src = p1 if n in p1.params else p2
                u = _to_unit(src.params[n], dists[n])
            if self._rng.random() < mut_prob:
                u = self._poly_mutate(u)
            child[n] = u
        return child

    def sample(self, study, name, dist, trial=None):
        done = [t for t in study.get_trials() if t.state == COMPLETE
                and t.values is not None]
        if len([t for t in done if name in t.params]) < self.n_startup_trials:
            return _dist_sample_random(self._rng, dist)
        cache = getattr(trial, "_nsga_child", None) if trial is not None else None
        if cache is None:
            cache = self._make_child(study, done)
            if trial is not None:
                trial._nsga_child = cache
        if name in cache:
            return _from_unit(cache[name], dist)
        return _dist_sample_random(self._rng, dist)  # name absent from both parents


class MOTPESampler(TPESampler):
    """Multi-objective TPE: 'good' = Pareto front, 'bad' = the rest."""

    def sample(self, study, name, dist, trial=None):
        done = [t for t in study.get_trials() if t.state == COMPLETE and name in t.params
                and t.values is not None]
        if len(done) < self.n_startup_trials:
            return _dist_sample_random(self._rng, dist)
        front = _pareto_front(done, study.directions)
        rest = [t for t in done if t not in front]
        good = [_to_unit(t.params[name], dist) for t in front] or [0.5]
        bad = [_to_unit(t.params[name], dist) for t in rest] or [0.5]
        bw = max(1.0 / max(len(good), 1) ** 0.5 * 0.2, 0.05)

        def kde(points, x):
            return sum(math.exp(-0.5 * ((x - p) / bw) ** 2) for p in points) / (len(points) * bw)

        best_x, best_score = None, -math.inf
        for _ in range(self.n_ei_candidates):
            base = self._rng.choice(good)
            x = min(max(base + self._rng.gauss(0, bw), 0.0), 1.0)
            score = math.log(kde(good, x) + 1e-12) - math.log(kde(bad, x) + 1e-12)
            if score > best_score:
                best_x, best_score = x, score
        return _from_unit(best_x, dist)


# ---------------------------------------------------------------------------
# Pruners
# ---------------------------------------------------------------------------


class MedianPruner:
    """Prune if the trial's best intermediate result so far is worse than
    the median of other trials' values at the same step (Optuna's documented
    MedianPruner semantics; reference uses MedianPruner(n_startup_trials=10)).

    Peers include RUNNING trials that have already reported (with N
    concurrent inter-trial workers most comparable trials ARE running);
    FAIL trials and non-finite reports are excluded so one diverged trial
    cannot poison the median; the startup gate counts finished trials
    only."""

    def __init__(self, n_startup_trials: int = 5, n_warmup_steps: int = 0):
        self.n_startup_trials = n_startup_trials
        self.n_warmup_steps = n_warmup_steps

    def prune(self, study, trial: FrozenTrial) -> bool:
        step = trial.last_step
        if step is None or step < self.n_warmup_steps:
            return False
        all_trials = [t for t in study.get_trials()
                      if t.number != trial.number and t.state != FAIL]
        finished = [t for t in all_trials
                    if t.state in (COMPLETE, PRUNED) and t.intermediate_values]
        if len(finished) < self.n_startup_trials:
            return False
        peers = []
        for t in all_trials:
            if not t.intermediate_values:
                continue
            # value at the LARGEST step <= step — dict insertion order is not
            # step order if reports ever arrive out of order (resume,
            # multiple callbacks); SHA below sorts for the same reason
            at_step = [v for s, v in sorted(t.intermediate_values.items())
                       if s <= step and math.isfinite(v)]
            if at_step:
                peers.append(at_step[-1])
        if not peers:
            return False
        median = float(np.median(peers))
        values = list(trial.intermediate_values.values())
        if any(not math.isfinite(v) for v in values):
            return True  # diverged (NaN/inf report): prune, as Optuna does
        if study.direction == "minimize":
            return min(values) > median
        return max(values) < median


class SuccessiveHalvingPruner:
    def __init__(self, min_resource: int = 1, reduction_factor: int = 4,
                 min_early_stopping_rate: int = 0):
        self.min_resource = min_resource
        self.reduction_factor = reduction_factor
        self.min_early_stopping_rate = min_early_stopping_rate

    def _rungs(self, step: int):
        rung = 0
        resource = self.min_resource * self.reduction_factor**self.min_early_stopping_rate
        rungs = []
        while resource <= step:
            rungs.append(resource)
            rung += 1
            resource *= self.reduction_factor
        return rungs

    def prune(self, study, trial: FrozenTrial) -> bool:
        step = trial.last_step
        if step is None:
            return False
        rungs = self._rungs(step)
        if not rungs:
            return False
        rung = rungs[-1]
        value = [v for s, v in sorted(trial.intermediate_values.items()) if s <= rung]
        if not value:
            return False
        value = value[-1]
        peers = [value]
        for t in study.get_trials():
            if t.number == trial.number or not t.intermediate_values:
                continue
            at = [v for s, v in sorted(t.intermediate_values.items()) if s <= rung]
            if at:
                peers.append(at[-1])
        if len(peers) < self.reduction_factor:
            return False
        peers_sorted = sorted(peers) if study.direction == "minimize" else sorted(peers, reverse=True)
        cutoff = peers_sorted[max(0, len(peers) // self.reduction_factor - 1)]
        return (value > cutoff) if study.direction == "minimize" else (value < cutoff)


class NopPruner:
    def prune(self, study, trial) -> bool:
        return False


class samplers:  # namespace mirroring optuna.samplers
    RandomSampler = RandomSampler
    TPESampler = TPESampler
    CmaEsSampler = CmaEsSampler
    NSGAIISampler = NSGAIISampler
    MOTPESampler = MOTPESampler


class pruners:  # namespace mirroring optuna.pruners
    MedianPruner = MedianPruner
    SuccessiveHalvingPruner = SuccessiveHalvingPruner
    NopPruner = NopPruner


# ---------------------------------------------------------------------------
# Study
# ---------------------------------------------------------------------------


class Study:
    def __init__(self, study_name: str, storage: Optional[str], sampler, pruner, directions):
        self.study_name = study_name
        self.sampler = sampler or TPESampler()
        self.pruner = pruner or MedianPruner()
        self.directions = list(directions)
        self._storage = _Storage(storage, study_name)

    @property
    def direction(self) -> str:
        return self.directions[0]

    def get_trials(self) -> List[FrozenTrial]:
        return [_freeze(t) for t in self._storage.all_trials()]

    @property
    def trials(self) -> List[FrozenTrial]:
        return self.get_trials()

    @property
    def best_trial(self) -> FrozenTrial:
        done = [t for t in self.get_trials() if t.state == COMPLETE and t.value is not None]
        if not done:
            raise ValueError("No completed trials.")
        sign = 1.0 if self.direction == "minimize" else -1.0
        return min(done, key=lambda t: sign * t.value)

    @property
    def best_trials(self) -> List[FrozenTrial]:
        done = [t for t in self.get_trials() if t.state == COMPLETE and t.values is not None]
        return _pareto_front(done, self.directions)

    def ask(self) -> Trial:
        number = self._storage.create_trial()
        return Trial(self, number)

    def tell(self, trial: Trial, state: str, value=None):
        if isinstance(value, tuple):
            value = list(value)
        self._storage.update_trial(trial.number, state=state, value=value)

    def optimize(self, func: Callable, n_trials: Optional[int] = None,
                 timeout: Optional[float] = None, catch: tuple = (),
                 gc_after_trial: bool = False):
        start = time.time()
        i = 0
        while True:
            if n_trials is not None and i >= n_trials:
                break
            if timeout is not None and time.time() - start > timeout:
                break
            trial = self.ask()
            try:
                value = func(trial)
                if isinstance(value, tuple):
                    value = list(value)
                self.tell(trial, COMPLETE, value)
            except TrialPruned:
                last = trial._intermediate
                value = last[max(last)] if last else None
                self.tell(trial, PRUNED, value)
            except catch as e:
                print(f"Trial {trial.number} failed with {type(e).__name__}: {e}")
                self.tell(trial, FAIL)
            except BaseException:
                # uncaught: mark FAIL (Optuna does) before propagating so the
                # shared storage never carries a ghost RUNNING row
                self.tell(trial, FAIL)
                raise
            if gc_after_trial:
                gc.collect()
            i += 1


def create_study(
    study_name: str = "study",
    storage: Optional[str] = None,
    sampler=None,
    pruner=None,
    direction: Optional[str] = None,
    directions: Optional[Sequence[str]] = None,
    load_if_exists: bool = False,
) -> Study:
    if directions is None:
        directions = [direction or "minimize"]
    study = Study(study_name, storage, sampler, pruner, directions)
    study._storage.set_directions(directions)
    return study


def load_study(study_name: str, storage: str, sampler=None, pruner=None) -> Study:
    """Attach to an existing study; directions come from the studies table so
    multi-objective workers see BOTH objectives (a hardcoded ['minimize']
    here would zip-truncate Pareto dominance to objective 0 on workers >=1)."""
    study = Study(study_name, storage, sampler, pruner, ["minimize"])
    persisted = study._storage.get_directions()
    if persisted:
        study.directions = list(persisted)
    return study
