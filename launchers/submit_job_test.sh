#!/bin/bash
# Environment sanity probe, the analogue of MirrorFusion/slurm/submit_job_test.sh
# (which prints python/cuda/nvidia-smi on an allocated GPU node): verifies the
# node this lands on can actually see its TPU slice before queueing real work.
# Submit it through wrapper.sh or run directly.
set -uo pipefail

pwd
echo "JOB_NAME: ${SLURM_JOB_NAME:-local}"
echo "LOG_DIR: ${LOG_DIR:-unset}"
which python
python --version

# the nvidia-smi analogue: platform, chip inventory, host/device topology
python - <<'EOF'
import jax

print("jax", jax.__version__)
print("process", jax.process_index(), "of", jax.process_count())
print("local devices:", jax.local_devices())
print("global device count:", jax.device_count())
d = jax.devices()[0]
print("device kind:", d.device_kind, "platform:", d.platform)
import jax.numpy as jnp

x = jnp.ones((1024, 1024), jnp.bfloat16)
print("matmul smoke:", float((x @ x).sum()) == 1024.0 * 1024 * 1024)
EOF

# move scheduler logs under LOG_DIR like the reference does
if [ -n "${SLURM_JOB_NAME:-}" ] && [ -n "${LOG_DIR:-}" ]; then
    mv "${SLURM_JOB_NAME}_${SLURM_JOB_ID}".{out,err} "$LOG_DIR/" 2>/dev/null || true
fi
