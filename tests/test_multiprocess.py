"""True multi-process (DCN-path) distributed test.

Runs `tools/multiprocess_dryrun.py`: 2 real `jax.distributed` processes
(4 virtual CPU devices each -> one 8-device global mesh) executing a
sharded train step via jax.make_array_from_process_local_data, loader
process striding, coordination-service barriers, and the eval CSV
shard-merge — the reference's production topology
(`accelerate launch --num_processes=8`, slurm/train.sh:23-41; process-group
init train_brushnet_mirror.py:902-907; barrier/merge
metrics/evaluate_metrics.py:376-381).

Slow-gated: the two workers compile the train step from scratch (the
XLA:CPU AOT cache cannot be shared across processes on this jax version),
~6-8 min on a 1-vCPU box.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def test_two_process_distributed_dryrun(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m",
         "reflecting_reality_tpu.tools.multiprocess_dryrun",
         "--out_dir", str(tmp_path)],
        cwd=repo, capture_output=True, text=True, timeout=3000,
    )
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]
    assert '"ok": true' in r.stdout
