#!/usr/bin/env bash
# Reference inference recipe (reference: MirrorFusion/slurm/test.sh +
# test_brushnet.py:288-310): 50 UniPC steps, CFG 7.5, 4 seeds/sample.
# Multi-host sharding is automatic via jax.process_index work splitting.
set -euo pipefail

CKPT=${CKPT:-runs/logs/sd15_full/checkpoint-20000}
BASE_MODEL=${BASE_MODEL:-checkpoints/stable-diffusion-v1-5}
DATA_DIR=${DATA_DIR:-data/blenderproc}

python -m reflecting_reality_tpu.cli.test \
  --brushnet_path "$CKPT" \
  --base_model_path "$BASE_MODEL" \
  --train_data_dir "$DATA_DIR" \
  --csv test.csv \
  --num_inference_steps 50 \
  --CFG 7.5 \
  --num_images_per_validation 4 \
  --brushnet_conditioning_scale 1.0 \
  --depth_conditioning_mode concat \
  --seed 42 \
  "$@"
