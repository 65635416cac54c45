#!/bin/bash
# Full-rate training on a relay-limited chip: the pixel-input recipe
# (train_tpu_e2e.sh) is host->device-bandwidth-bound through this
# environment's relayed TPU transport (~16 MB/step bf16 inputs vs
# ~20 MB/s relay), so this variant trains from the latent-moments cache
# (tools/precompute_latents.py + --precomputed_latents_dir): ~0.3 MB/step,
# bit-identical loss stream (tests/test_training.py::TestLatentCache), and
# the measured steps/s is comparable to benchmark_train_step.py's
# cached-latents row.  On an un-relayed TPU host the pixel path runs at
# full rate and this cache is simply the 5.1x host-pipeline accelerator
# (benchmarks/PROFILE.md "Latent-moments caching").
#
# Usage: bash launchers/train_tpu_cached.sh [WORKDIR] [STEPS]
set -euo pipefail

WORK=${1:-/tmp/rr_e2e}
STEPS=${2:-400}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
RUN="$WORK/run_cached"
LOG="$WORK/logs_cached"
CACHE="$WORK/latent_cache"
mkdir -p "$LOG"

export RR_TRANSFER_TIMEOUT_S=${RR_TRANSFER_TIMEOUT_S:-600}
export RR_TRANSFER_CHUNK_BYTES=${RR_TRANSFER_CHUNK_BYTES:-$((16 * 1024 * 1024))}
export RR_TRANSFER_PACE_S=${RR_TRANSFER_PACE_S:-0.05}

if [ ! -f "$WORK/sd15/unet/config.json" ]; then
  echo "== fixture: checkpoint + data =="
  python -m reflecting_reality_tpu.tools.make_synthetic_fullscale \
      --out "$WORK" --n 64 --size 512
fi

if [ ! -d "$CACHE" ] || [ -z "$(ls "$CACHE" 2>/dev/null)" ]; then
  echo "== precompute latent moments =="
  python -m reflecting_reality_tpu.tools.precompute_latents \
      --pretrained_model_name_or_path "$WORK/sd15" \
      --train_data_dir "$WORK/data" \
      --output_dir "$CACHE" \
      --resolution 512 --batch_size 8 \
      --depth_conditioning_mode concat \
      2>&1 | tee "$LOG/precompute.log"
fi

echo "== train: $STEPS steps from cached moments =="
retry() {
  local n=$1 log=$2 i; shift 2
  for i in $(seq 1 "$n"); do
    if "$@" 2>&1 | tee -a "$log"; then return 0; fi
    echo "== attempt $i/$n failed; retrying in 30s ==" | tee -a "$log"
    sleep 30
  done
  return 1
}
retry 3 "$LOG/train.log" \
  python -m reflecting_reality_tpu.cli.train \
    --pretrained_model_name_or_path "$WORK/sd15" \
    --train_data_dir "$WORK/data" \
    --precomputed_latents_dir "$CACHE" \
    --output_dir "$RUN" \
    --logging_dir "$LOG" \
    --report_to jsonl \
    --resolution 512 \
    --train_batch_size 4 \
    --learning_rate 1e-4 \
    --lr_scheduler constant \
    --lr_warmup_steps 0 \
    --snr_gamma 5.0 \
    --mixed_precision bf16 \
    --gradient_checkpointing \
    --depth_conditioning_mode concat \
    --use_ema --ema_dtype bf16 \
    --async_save \
    --checkpointing_steps "$STEPS" \
    --validation_steps 0 \
    --log_every 10 \
    --seed 0 \
    --dataloader_num_workers 4 \
    --proportion_empty_prompts 0.2 \
    --steps_per_dispatch 100 \
    --input_transport_dtype auto \
    --compilation_cache_dir "$REPO/.jax_cache" \
    --device_cache \
    --max_train_steps "$STEPS" --resume_from_checkpoint latest

echo "== summary =="
python - "$LOG/metrics.jsonl" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if '"loss"' in l]
losses = [(r["step"], r["loss"]) for r in rows if "loss" in r]
sps = sorted(r["steps_per_sec"] for r in rows if "steps_per_sec" in r)
first = sum(l for _, l in losses[:5]) / max(len(losses[:5]), 1)
last = sum(l for _, l in losses[-5:]) / max(len(losses[-5:]), 1)
print(f"logged points: {len(losses)}  first5 loss={first:.4f}  last5 loss={last:.4f}")
print(f"median steps/s: {sps[len(sps)//2]:.2f}  p90: {sps[int(len(sps)*0.9)]:.2f}")
assert last < first, "loss did not decrease"
EOF
echo "CACHED RUN OK"
