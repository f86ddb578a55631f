#!/usr/bin/env bash
# Inter-trial HPO: N worker processes, one Optuna-style trial each, sharing
# one SQLite study — the TPU equivalent of reference
# scripts/example_hyperparam_opt_inter_trial.jb (one MPI rank per trial).
# Each worker should own its own TPU slice/chips (set TPU_VISIBLE_DEVICES or
# run on separate VMs); SARAGAN_WORKER_ID replaces the MPI rank.
#
# Usage: bash scripts/hpo_inter_trial.sh <dataset_path> <num_workers> [ntrials]
set -euo pipefail

DATASET=${1:?dataset path}
NWORKERS=${2:?number of workers}
NTRIALS=${3:-None}
STORAGE="sqlite:///$(pwd)/optuna_study.db"

pids=()
for ((w = 0; w < NWORKERS; w++)); do
  SARAGAN_WORKER_ID=$w SARAGAN_NUM_WORKERS=$NWORKERS \
  python -m saragan_tpu pgan "$DATASET" \
    --start_shape '(1, 1, 4, 4)' --final_shape '(1, 64, 256, 256)' \
    --starting_phase 1 --ending_phase 4 \
    --latent_dim 256 --noise_stddev 0.05 \
    --mixing_nimg 131072 --stabilizing_nimg 131072 \
    --base_batch_size None --g_lr None --d_lr None --optimizer None \
    --loss_fn wgan --gp_weight 10.0 \
    --optuna_distributed --optuna_ntrials "$NTRIALS" \
    --optuna_storage "$STORAGE" --optuna_study_name saragan \
    --optuna_sampler TPE --optuna_pruner median \
    --calc_metrics --compute_FID \
    --compute_dtype bfloat16 \
    --logdir runs/hpo &
  pids+=($!)
done
wait "${pids[@]}"
