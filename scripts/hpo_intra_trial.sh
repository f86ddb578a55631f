#!/usr/bin/env bash
# Intra-trial HPO: one study driver, each trial trained data-parallel over
# the whole mesh — the TPU equivalent of reference
# scripts/example_hyperparam_opt_intra_trial.jb (rank 0 drives Optuna, DP
# inside each trial).
#
# Usage: bash scripts/hpo_intra_trial.sh <dataset_path> <ntrials>
set -euo pipefail

DATASET=${1:?dataset path}
NTRIALS=${2:-16}

python -m saragan_tpu pgan "$DATASET" \
  --start_shape '(1, 1, 4, 4)' --final_shape '(1, 64, 256, 256)' \
  --starting_phase 1 --ending_phase 4 \
  --latent_dim 256 --noise_stddev 0.05 \
  --mixing_nimg 131072 --stabilizing_nimg 131072 \
  --base_batch_size None --g_lr None --d_lr None \
  --loss_fn wgan --gp_weight 10.0 \
  --horovod \
  --optuna_ntrials "$NTRIALS" \
  --optuna_storage "sqlite:///$(pwd)/optuna_study.db" --optuna_study_name saragan \
  --optuna_sampler TPE --optuna_pruner median \
  --calc_metrics --compute_FID \
  --compute_dtype bfloat16 \
  --logdir runs/hpo_intra
