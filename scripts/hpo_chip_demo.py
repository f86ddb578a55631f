"""On-hardware HPO sweep demo: the full Optuna-compatible harness driving
real training trials on the chip (SURVEY C22/C23; reference run mode
`example_hyperparam_opt_*.jb`).

8 trials of 3D pgan, phases 1->3 (4³->16³) on structured blob volumes;
the trial samples both learning rates (left None) and optimizes the
run-internal proxy-FID (RandomConvFeatures — uncalibrated values never reach
external reports; within one study they are comparable).  Sampler selectable:
TPE (default), CMA (full CMA-ES), and the multi-objective NSGAII/MOTPE —
which switch the objective to (FID, train_time) exactly as the reference
does (main.py:44,139-143) and report the Pareto front.  Single-objective
runs assert the sampler's best beats the median; multi-objective runs
assert a non-vacuous front containing the best-FID trial.

Run (real chip): python scripts/hpo_chip_demo.py [outdir] [ntrials] [sampler] [mode] [hpo_seeds]

hpo_seeds > 1 (round 5, VERDICT r4 item 3): every trial trains its config
under k seeds and the sampler optimizes the MEDIAN proxy-FID; per-seed
values land in trial.user_attrs["seed_values"], and the summary reports
whether the ranking survives reseeding (per-trial seed spread vs
between-trial gaps).
mode "nas": architecture search instead of LR search — kernel_spec/
filter_spec carry None entries, so the trial samples per-layer kernel
shapes (odd 1-7, cubic via optuna_square_kernels) and filter counts
(powers of two, per-phase caps) exactly as the reference's NAS space
(optuna_suggestions.py:235-276); learning rates are pinned so the sweep
isolates the architectural axis.  Every trial compiles its own network.
CPU wiring check: HPO_DEMO_SMOKE=1 ... (toy budgets, assertions relaxed)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convergence_run import build_dataset  # noqa: E402  (same synthetic pyramid)

from saragan_tpu.config import Config  # noqa: E402
from saragan_tpu.hpo import harness  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hpo_chip_demo"
    ntrials = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sampler = sys.argv[3] if len(sys.argv) > 3 else "TPE"  # "CMA" = the
    # round-3 full CMA-ES (CSA step-size, evolution paths, IPOP) on hardware
    mode = sys.argv[4] if len(sys.argv) > 4 else "lr"
    hpo_seeds = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    dataroot = os.path.join(outdir, "data")
    os.makedirs(outdir, exist_ok=True)
    # HPO_DEMO_SMOKE=1: toy budgets for a CPU wiring check of the harness
    # (the real demo runs on the chip with the budgets below)
    smoke = bool(int(os.environ.get("HPO_DEMO_SMOKE", "0")))
    print("Building synthetic blob pyramid (16^3 master) ...", flush=True)
    mean, std = build_dataset(dataroot, n=32 if smoke else 256, master=16)

    cfg = Config(
        architecture="pgan",
        dataset_path=dataroot,
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 32, 32, 32)",  # phases 1-3 -> 4,8,16
        starting_phase=1,
        ending_phase=3,
        latent_dim=64,
        network_size="xs",
        base_batch_size=64,
        max_global_batch_size=64,
        mixing_nimg=16 if smoke else 2048,
        stabilizing_nimg=32 if smoke else 4096,
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        adam_beta1=0.0,
        adam_beta2=0.9,
        g_lr=None,  # sampled by the trial (None-means-searchable)
        d_lr=None,
        ema_beta=0.99,
        data_mean=mean,
        data_stddev=std,
        calc_metrics=True,
        compute_FID=True,
        allow_uncalibrated_fid=True,  # run-internal objective only
        num_metric_samples=8 if smoke else 32,
        metrics_batch_size=8 if smoke else 32,
        metrics_every_nsteps=10**9,  # only end-of-phase metrics
        summary_small_every_nsteps=4096,
        grad_histograms=False,
        summary_large_every_nsteps=10**9,
        checkpoint_every_nsteps=10**9,
        compute_dtype="bfloat16",
        fused_transitions=True,
        optuna_ntrials=ntrials,
        optuna_storage=f"sqlite:///{outdir}/study.db",
        optuna_study_name="chip_demo",
        optuna_sampler=sampler,
        optuna_pruner="nopruner",
        hpo_seeds=hpo_seeds,
        logdir=os.path.join(outdir, "logs"),
    )
    if hpo_seeds > 1:
        # k-seed sweeps pay k trainings per trial; halve the per-leg budget
        # so the wall stays comparable to the single-seed sweeps
        cfg = dataclasses.replace(cfg, mixing_nimg=1024, stabilizing_nimg=2048)

    if mode == "nas":
        # architecture search: None entries in the specs are what triggers
        # the NAS suggestions (reference optuna_suggestions.py:247-276);
        # LRs pinned to the TPE sweep's best so only architecture varies.
        cfg = dataclasses.replace(
            cfg,
            g_lr=0.0545,
            d_lr=0.0141,
            # pin the LR schedules flat too (setting the niters alone stops
            # pick_schedule from sampling; kind None = no ramp) — the sweep
            # then varies ONLY the architecture
            g_lr_rise_niter=1, g_lr_decay_niter=1,
            d_lr_rise_niter=1, d_lr_decay_niter=1,
            optuna_square_kernels=True,  # cubic kernels: one knob per conv
            kernel_spec=[
                [[], [None, None, None]],
                [[None, None, None], [None, None, None]],
                [[None, None, None], [None, None, None]],
            ],
            filter_spec=[[None, None], [None, None], [None, None]],
            optuna_study_name="chip_demo_nas",
        )

    t0 = time.time()
    study = harness.run(cfg)
    wall = time.time() - t0

    if harness.is_multi_objective(cfg):
        # (FID, train_time) multi-objective (reference main.py:44,139-143,
        # optuna_objective.py:643-646): report the Pareto front
        done = [t for t in study.trials if t.state == "COMPLETE" and t.values]
        front = study.best_trials
        front_nums = {t.number for t in front}
        print(f"{len(done)}/{ntrials} trials complete in {wall:.0f}s")
        for t in done:
            tag = "FRONT" if t.number in front_nums else "     "
            print(f"  {tag} trial {t.number}: FID {t.values[0]:.3f}  "
                  f"train_s {t.values[1]:.1f}  params {t.params}")
        assert len(done) >= ntrials - 1, "trials failed"
        assert front and all(np.isfinite(v) for t in front for v in t.values)
        fids = [t.values[0] for t in done]
        assert min(t.values[0] for t in front) == min(fids)
        if not smoke:
            # the front contains the best-FID and best-time trials by
            # definition; a front spanning ALL trials means no trade-off was
            # resolved — require it to exclude at least one dominated trial
            # (8 trials over a 3-decade lr space always produce dominated ones)
            assert len(front) < len(done), "no trial was dominated — front is vacuous"
        print(f"HPO MULTI-OBJECTIVE DEMO OK: front {len(front)}/{len(done)}")
        return

    done = [t for t in study.trials if t.state == "COMPLETE" and t.value is not None]
    values = sorted(float(t.value) for t in done)
    best = study.best_trial
    print(f"{len(done)}/{ntrials} trials complete in {wall:.0f}s")
    print(f"proxy-FID best {values[0]:.3f}  median {np.median(values):.3f}  "
          f"worst {values[-1]:.3f}")
    print(f"best params: {best.params}")
    assert len(done) >= ntrials - 1, "trials failed"
    if hpo_seeds > 1:
        # ranking-stability readout: does the median-ranked winner also win
        # under every individual seed, and how do per-trial seed spreads
        # compare to between-trial gaps?
        rows = []
        for t in done:
            sv = t.user_attrs.get("seed_values")
            assert sv and len(sv) == hpo_seeds, (t.number, t.user_attrs)
            rows.append((t.number, float(t.value), sv))
            print(f"  trial {t.number}: median {t.value:.3f}  seeds "
                  f"{[round(v, 2) for v in sv]}  spread "
                  f"{max(sv) - min(sv):.3f}")
        by_median = sorted(rows, key=lambda r: r[1])
        winner = by_median[0][0]
        per_seed_winners = [
            min(rows, key=lambda r: r[2][j])[0] for j in range(hpo_seeds)
        ]
        spreads = [max(sv) - min(sv) for _, _, sv in rows]
        gaps = [b[1] - a[1] for a, b in zip(by_median, by_median[1:])]
        stable = all(w == winner for w in per_seed_winners)
        print(f"median-ranking winner: trial {winner}; per-seed winners: "
              f"{per_seed_winners} -> ranking "
              f"{'SURVIVES' if stable else 'DOES NOT SURVIVE'} reseeding")
        print(f"median per-trial seed spread {np.median(spreads):.3f} vs "
              f"median between-trial gap {np.median(gaps) if gaps else 0:.3f}")
    if mode == "nas":
        # every trial must have sampled the architectural knobs, and the
        # study must contain >1 distinct architecture (diversity gate only
        # for real sweeps — a 1-trial smoke can't satisfy it)
        archs = set()
        for t in done:
            nas_keys = [k for k in t.params if k.startswith(("Kernel_size_", "Filter_count_"))]
            assert nas_keys, f"trial {t.number} sampled no NAS parameters"
            archs.add(tuple(sorted((k, t.params[k]) for k in nas_keys)))
        if not smoke:
            assert len(archs) > 1, "NAS sweep explored a single architecture"
    if not smoke:
        assert values[0] < np.median(values), "sampler found nothing better than median"
    print("HPO NAS DEMO OK" if mode == "nas" else "HPO DEMO OK")


if __name__ == "__main__":
    main()
