#!/usr/bin/env bash
# Multi-host TPU pod training (e.g. v5e-64: 8 hosts x 8 chips).
# Launch this on EVERY host of the pod slice, e.g. with
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all --command="bash ..."
# jax.distributed picks up the pod topology from the TPU runtime; the
# gradient all-reduce rides ICI inside the slice (SURVEY §5.8).
set -euo pipefail

DATASET=${1:?dataset path}
LOGDIR=${2:?logdir (shared filesystem)}

export SARAGAN_MULTIHOST=1

python - "$DATASET" "$LOGDIR" <<'PY'
import sys
import jax

jax.distributed.initialize()  # TPU pod auto-detection
print(f"process {jax.process_index()}/{jax.process_count()}, "
      f"{jax.local_device_count()} local of {jax.device_count()} devices")

from saragan_tpu.cli import main

dataset, logdir = sys.argv[1], sys.argv[2]
main([
    "pgan", dataset,
    "--start_shape", "(1, 1, 4, 4)", "--final_shape", "(1, 128, 512, 512)",
    "--starting_phase", "1", "--ending_phase", "7",
    "--latent_dim", "512", "--network_size", "s",
    "--base_batch_size", "256", "--max_global_batch_size", "512",
    "--loss_fn", "wgan", "--gp_weight", "10.0", "--noise_stddev", "0.05",
    "--g_lr", "0.001", "--d_lr", "0.001",
    "--horovod", "--compute_dtype", "bfloat16",
    "--num_space_shards", "2",
    "--logdir", logdir,
])
PY
