#!/usr/bin/env bash
# Reference eval recipe (reference: MirrorFusion/slurm/metrics.sh): calc the
# selection metric over all seeds, then best-seed metrics, then averages.
# Shard across hosts with --shard_id/--num_shards.
set -euo pipefail

INFER_DIR=${INFER_DIR:-runs/logs/sd15_full/checkpoint-20000/inference}
DATA_DIR=${DATA_DIR:-data/blenderproc}

python -m reflecting_reality_tpu.metrics.evaluate \
  --train_data_dir "$DATA_DIR" --infer_dir "$INFER_DIR" \
  --metrics mask --mode calc "$@"
python -m reflecting_reality_tpu.metrics.evaluate \
  --train_data_dir "$DATA_DIR" --infer_dir "$INFER_DIR" \
  --metrics all --mode best --select_metric mask_SSIM "$@"
python -m reflecting_reality_tpu.metrics.evaluate \
  --train_data_dir "$DATA_DIR" --infer_dir "$INFER_DIR" \
  --mode avg
