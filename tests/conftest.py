"""Test harness: run on a virtual 8-device CPU mesh (SURVEY.md §4 rebuild plan).

Mirrors the reference's capability-gating approach (testing_utils.py decorators)
— multi-chip behavior is validated on host-platform virtual devices instead of
requiring a TPU pod.
"""

import os
import sys

# Must be set before jax initializes its backends.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
