#!/bin/bash
# Cluster-glue analogue of MirrorFusion/slurm/wrapper.sh: submit any launcher
# script with a log directory threaded through LOG_DIR.
#
# On a SLURM-managed TPU cluster this sbatch-es the script exactly like the
# reference; anywhere else (single TPU VM, dev box) it runs the script
# directly under nohup so the semantics — detached job, logs under LOG_DIR —
# are preserved without a scheduler.
#
# Usage: bash launchers/wrapper.sh <script> [log_directory]
#   e.g. bash launchers/wrapper.sh train.sh runs/logs/sd15_full_1
set -euo pipefail

if [ "$#" -lt 1 ] || [ "$#" -gt 2 ]; then
    echo "Usage: $0 <launcher_script> [log_directory]"
    echo "Example: $0 launchers/train.sh runs/logs/sd15_full_1"
    exit 1
fi

SCRIPT=$1
LOG_DIR=${2:-launchers/logs}
mkdir -p "$LOG_DIR"

# prefix launchers/ if not already, add .sh if missing (reference behavior)
[[ $SCRIPT =~ ^launchers/ ]] || SCRIPT="launchers/$SCRIPT"
[[ $SCRIPT =~ \.sh$ ]] || SCRIPT="$SCRIPT.sh"
if [[ ! -f $SCRIPT ]]; then
    echo "Error: launcher script '$SCRIPT' not found."
    exit 1
fi

if command -v sbatch >/dev/null 2>&1; then
    sbatch --export=ALL,LOG_DIR="$LOG_DIR" "$SCRIPT"
else
    STAMP=$(date +%Y%m%d_%H%M%S)
    LOG="$LOG_DIR/$(basename "$SCRIPT" .sh)_$STAMP.log"
    LOG_DIR="$LOG_DIR" nohup bash "$SCRIPT" >"$LOG" 2>&1 &
    echo "started $(basename "$SCRIPT") pid=$! log=$LOG"
fi
