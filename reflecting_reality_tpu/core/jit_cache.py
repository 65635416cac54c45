"""Persistent XLA compilation cache wiring.

The 1024² pipeline's 50-step scan costs ~190 s of cold compile through the
TPU relay (benchmarks/benchmark_pipeline_1024.py); with a persistent cache
the second process pays ~0.  The reference has no equivalent concern (torch
eager) — this is TPU-native operational surface.

Enabled by the `--compilation_cache_dir` CLI flag (cli/train.py, cli/test.py)
or the JAX_COMPILATION_CACHE_DIR env var jax honors natively.
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(cache_dir: Optional[str]) -> None:
    """Point jax's persistent compilation cache at `cache_dir` (no-op if None)."""
    if not cache_dir:
        return
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes meaningful compile time; the relay's
    # fixed dispatch latency already dwarfs sub-second compiles.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def enable_default_compilation_cache() -> str:
    """Enable the persistent cache at a repo-local default directory.

    Used by the benchmark harness so repeated chip sessions don't re-pay
    the 200-660 s cold compiles of the big pipeline programs.  Override
    with RRTPU_COMPILE_CACHE; the CLIs keep their explicit
    `--compilation_cache_dir` flag semantics.
    """
    cache_dir = (
        os.environ.get("RRTPU_COMPILE_CACHE")
        # a user-set JAX_COMPILATION_CACHE_DIR must win over the repo-local
        # default (jax.config.update would otherwise override the env var)
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    )
    enable_compilation_cache(cache_dir)
    return cache_dir
