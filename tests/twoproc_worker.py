"""Worker script for the 2-process jax.distributed CPU tests.

Launched (twice) by tests/test_multiprocess.py:

    python tests/twoproc_worker.py <coordinator> <process_id> <outdir>

Covers the real multi-host code paths that single-process tests cannot
(VERDICT r1 weak #4 / item 3): batch_sharded exactly-once interleaving
across processes, broadcast_scalar/broadcast_json, SynchronizedTrial's
lockstep prune, and shard_global_batch's
make_array_from_process_local_data assembly.
"""

import json
import os
import sys


def force_cpu():
    # the axon sitecustomize pins jax_platforms='axon,cpu'; this exact order
    # re-points an already-imported jax at N local CPU devices (CLAUDE.md)
    import jax
    from jax._src import xla_bridge

    jax.config.update("jax_platforms", "cpu")
    xla_bridge._clear_backends()
    jax.clear_caches()
    jax.config.update("jax_num_cpu_devices", 2)


def main():
    coordinator, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    force_cpu()
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=pid
    )
    import numpy as np

    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 local CPU devices per process

    results = {}

    # --- broadcast primitives -----------------------------------------
    from saragan_tpu.parallel.multihost import (
        SynchronizedTrial,
        broadcast_json,
        broadcast_scalar,
        synchronized_trial,
    )

    results["bcast_scalar"] = broadcast_scalar(3.25 if pid == 0 else -1.0)
    results["bcast_json"] = broadcast_json(
        {"lr": 1e-3, "opt": "Adam"} if pid == 0 else None
    )

    # --- batch_sharded exactly-once interleaving ----------------------
    from saragan_tpu.data.dataset import NumpyPathDataset

    datadir = os.path.join(outdir, "data")
    if pid == 0:
        os.makedirs(datadir, exist_ok=True)
        for i in range(8):
            np.save(os.path.join(datadir, f"v{i}.npy"),
                    np.full((2, 4, 4), float(i), np.float32))
        open(os.path.join(datadir, ".ready"), "w").close()
    else:
        import time

        while not os.path.exists(os.path.join(datadir, ".ready")):
            time.sleep(0.1)

    ds = NumpyPathDataset(datadir, None, seed=7)
    drawn = []
    for _ in range(2):  # two global batches of 4 -> all 8 volumes exactly once
        b = ds.batch_sharded(2, 2, pid)
        drawn.extend(int(v) for v in b[:, 0, 0, 0, 0])
    results["sharded_ids"] = drawn

    # --- shard_global_batch via make_array_from_process_local_data ----
    from saragan_tpu.parallel import make_mesh, shard_global_batch

    mesh = make_mesh()  # 4 global devices -> data=4
    local = np.full((2, 1, 4, 4), float(pid), np.float32)  # per-process shard
    arr = shard_global_batch(mesh, local)
    assert arr.shape == (4, 1, 4, 4)
    s = jax.jit(
        lambda x: jax.numpy.sum(x),
        in_shardings=(arr.sharding,),
        out_shardings=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )(arr)
    results["global_sum"] = float(s)  # 0*32 + 1*32 = 32

    # --- SynchronizedTrial lockstep prune ------------------------------
    class PruneAtThird:
        number = 11

        def __init__(self):
            self.reports = []

        def report(self, v, step):
            self.reports.append((v, step))

        def should_prune(self):
            return len(self.reports) >= 3

        def suggest_float(self, name, low, high, **kw):
            return 0.123

        def suggest_categorical(self, name, choices):
            return list(choices)[1]

    real_trial = PruneAtThird() if pid == 0 else None
    st = synchronized_trial(real_trial)
    assert isinstance(st, SynchronizedTrial)
    results["trial_number"] = st.number
    results["suggested"] = st.suggest_float("lr", 0.0, 1.0)
    results["suggested_cat"] = st.suggest_categorical("opt", ["Adam", "LAMB"])
    pruned_at = None
    for step in range(6):
        st.report(float(step), step)  # only lands on process 0
        if st.should_prune():
            pruned_at = step
            break
    results["pruned_at"] = pruned_at
    # a no-trial run resolves to None on every process
    results["none_trial"] = synchronized_trial(None) is None

    # --- intra-trial HPO harness end-to-end ----------------------------
    results["harness"] = harness_e2e(outdir, pid)

    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(results, f)
    print(f"proc {pid} OK")


def harness_e2e(outdir, pid):
    """End-to-end intra-trial HPO across 2 processes: process 0 drives the
    shared-storage study, process 1 runs a local throwaway study; every
    objective call must see identical broadcast params and identical trial
    count (harness.run coordinator gating + synchronized_trial)."""
    import numpy as np

    from saragan_tpu.config import Config
    from saragan_tpu.hpo import harness

    calls = []

    def stub_objective(trial, cfg):
        from saragan_tpu.parallel.multihost import synchronized_trial

        trial = synchronized_trial(trial)
        lr = trial.suggest_float("generator_LR", 1e-4, 1e-1)
        calls.append(lr)
        return float((np.log10(lr) + 2.5) ** 2)

    cfg = Config(
        optuna_ntrials=4,
        optuna_storage=f"sqlite:///{outdir}/study.db",
        optuna_study_name="twoproc",
        optuna_sampler="TPE",
        noise_stddev=0.0,
    )
    study = harness.run(cfg, objective=stub_objective)

    # walltime mode: ntrials=None — whether another trial starts must be a
    # process-0 decision broadcast to all (divergent local clocks would hang
    # the survivors in the next collective)
    import time

    wt_calls = []

    def slow_objective(trial, cfg):
        from saragan_tpu.parallel.multihost import synchronized_trial

        trial = synchronized_trial(trial)
        wt_calls.append(trial.suggest_float("generator_LR", 1e-4, 1e-1))
        # process 1 sleeps longer: local clocks WOULD diverge without the
        # broadcast-driven continue decision
        time.sleep(0.2 + 0.3 * pid)
        return 1.0

    wt_cfg = Config(
        optuna_ntrials=None,
        optuna_walltime=1.2,
        optuna_storage=f"sqlite:///{outdir}/wt.db",
        optuna_study_name="twoproc_wt",
        optuna_sampler="random",
        noise_stddev=0.0,
    )
    harness.run(wt_cfg, objective=slow_objective)

    return {
        "lrs": calls,
        "n_trials": len(study.trials),
        "storage_is_shared": study._storage.path is not None,
        "walltime_ntrials": len(wt_calls),
    }


if __name__ == "__main__":
    main()
