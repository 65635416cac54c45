"""Test harness: run on a virtual 8-device CPU mesh (SURVEY.md §4 rebuild plan).

Mirrors the reference's capability-gating approach (testing_utils.py decorators)
— multi-chip behavior is validated on host-platform virtual devices instead of
requiring a TPU pod.

The container preloads jax with a TPU backend (sitecustomize registers an
"axon" PJRT plugin and sets JAX_PLATFORMS=axon before any test code runs), so
setting env vars here is too late for jax's config snapshot.  Instead we flip
the platform through jax.config before any backend is initialized — unit tests
validate math and sharding on an 8-device virtual host mesh; TPU runs are the
bench/driver's job.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (may already be imported by sitecustomize)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the suite compiles dozens of tiny-config
# graphs; caching them across runs cuts repeat-suite wall time sharply on
# small hosts (~27 -> ~17 min here).  Same wiring as the CLIs' 
# --compilation_cache_dir.  Override with JAX_COMPILATION_CACHE_DIR.
from reflecting_reality_tpu.core.jit_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
))

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    # Three tiers (VERDICT r2 item 7 — default suite must stay within a
    # ~10-min budget on a 1-vCPU box):
    #   default          — unit/golden math, <10 min
    #   RR_RUN_MEDIUM=1  — heavy jit-compile matrices (pipeline/SDXL/serve/
    #                      deepcache journeys); the pre-gate 46-min remainder
    #   RR_RUN_SLOW=1    — full-scale (real SD-1.5 config, GB-sized) harnesses
    # RR_RUN_SLOW implies medium.
    run_slow = bool(os.environ.get("RR_RUN_SLOW"))
    run_medium = run_slow or bool(os.environ.get("RR_RUN_MEDIUM"))
    skip_slow = pytest.mark.skip(reason="slow full-scale test; set RR_RUN_SLOW=1")
    skip_medium = pytest.mark.skip(
        reason="heavy compile-matrix test; set RR_RUN_MEDIUM=1")
    for item in items:
        if not run_slow and "slow" in item.keywords:
            item.add_marker(skip_slow)
        elif not run_medium and "medium" in item.keywords:
            item.add_marker(skip_medium)
