#!/usr/bin/env bash
# Reference training recipe (reference: MirrorFusion/slurm/train.sh:23-41 +
# MirrorFusion/README.md "Training"): 20K steps, lr 1e-5 constant, 512²,
# 20% prompt drop, depth concat, seed 42, --train_base_unet recommended.
#
# One process drives the whole TPU slice (pjit data-parallel over all local
# chips); for multi-host pods run this same script on every host — jax
# initializes the mesh from the TPU runtime environment.
set -euo pipefail

BASE_MODEL=${BASE_MODEL:-checkpoints/stable-diffusion-v1-5}
DATA_DIR=${DATA_DIR:-data/blenderproc}
OUTPUT_DIR=${OUTPUT_DIR:-runs/logs/sd15_full}

python -m reflecting_reality_tpu.cli.train \
  --pretrained_model_name_or_path "$BASE_MODEL" \
  --train_data_dir "$DATA_DIR" \
  --output_dir "$OUTPUT_DIR" \
  --resolution 512 \
  --train_batch_size 4 \
  --max_train_steps 20000 \
  --checkpointing_steps 5000 \
  --custom_checkpoints 10000 20000 \
  --learning_rate 1e-5 \
  --lr_scheduler constant \
  --lr_warmup_steps 0 \
  --proportion_empty_prompts 0.2 \
  --depth_conditioning_mode concat \
  --train_base_unet \
  --mixed_precision bf16 \
  --seed 42 \
  --validation_steps 1000 \
  --dataloader_num_workers 16 \
  "$@"
