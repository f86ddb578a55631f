#!/usr/bin/env bash
# Offline LIDC-IDRI preprocessing: DICOM/NRRD/npy volumes -> multiresolution
# npy pyramid (reference data_scripts/create_dataset.jb).
#
# Usage: bash scripts/prepare_lidc.sh <input_glob> <out_dir> [workers]
set -euo pipefail

INPUT=${1:?input glob, e.g. '/data/LIDC-IDRI/*/'}
OUT=${2:?output dir}
WORKERS=${3:-8}

python - "$INPUT" "$OUT" "$WORKERS" <<'PY'
import glob
import sys

from saragan_tpu.tools.prepare_data import create_dataset

inputs = sorted(glob.glob(sys.argv[1]))
print(f"{len(inputs)} input volumes")
create_dataset(inputs, sys.argv[2], method="lanczos", num_workers=int(sys.argv[3]))
PY
