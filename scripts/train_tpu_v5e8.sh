#!/usr/bin/env bash
# Normal training run on a single-host TPU VM (v5e-8) — the TPU equivalent of
# reference scripts/example_normal_run.jb:70-81 (mpirun -> one JAX process
# driving all 8 chips through the data mesh).
#
# Usage: bash scripts/train_tpu_v5e8.sh <dataset_path> <logdir>
set -euo pipefail

DATASET=${1:?dataset path}
LOGDIR=${2:-runs/pgan/$(date +%Y-%m-%d_%H-%M-%S)}

mkdir -p "$LOGDIR"
# self-archive the launch configuration next to the logs
# (reference example_normal_run.jb:34-41)
cp "$0" "$LOGDIR/"

python -m saragan_tpu pgan "$DATASET" \
  --start_shape '(1, 1, 4, 4)' --final_shape '(1, 128, 512, 512)' \
  --starting_phase 1 --ending_phase 6 \
  --latent_dim 512 --network_size xs \
  --base_batch_size 128 --max_global_batch_size 256 \
  --mixing_nimg 2097152 --stabilizing_nimg 2097152 \
  --loss_fn wgan --gp_weight 10.0 --noise_stddev 0.05 \
  --g_lr 0.001 --d_lr 0.001 \
  --horovod \
  --compute_dtype bfloat16 \
  --calc_metrics --compute_swds --compute_ssims --compute_FID \
  --data_mean 0.0 --data_stddev 1.0 \
  --logdir "$LOGDIR"
