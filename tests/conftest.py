"""Test harness: run on a virtual 8-device CPU mesh (SURVEY.md §4 rebuild plan).

Mirrors the reference's capability-gating approach (testing_utils.py decorators)
— multi-chip behavior is validated on host-platform virtual devices instead of
requiring a TPU pod.
"""

import os
import sys

# Must be set before jax initializes its backends.  Force CPU: unit tests
# validate math and sharding on an 8-device virtual host mesh; TPU runs are
# the bench/driver's job.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
