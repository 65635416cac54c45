"""Multi-host helpers (SURVEY.md §5 distributed backend: the reference's
Accelerate barrier/gather surface maps to jax.distributed + multihost
utilities over DCN; collectives inside jitted programs ride ICI).

- `initialize()`: idempotent jax.distributed.initialize for TPU pods (no-op
  in single-process runs — e.g. the one-chip bench or CPU tests).
- `barrier(name)`: cross-host sync (reference accelerator.wait_for_everyone,
  evaluate_metrics.py:376).
- `is_main_process()` / `local_shard(items)`: the PartialState surface.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax


def initialize(**kwargs) -> None:
    """Safe to call unconditionally at CLI start.

    Fails LOUDLY on a misconfigured pod: only the known "nothing to
    initialize" / "already initialized" cases are swallowed.  A typo'd
    coordinator address must raise, not silently degrade a pod run to
    single-host training (reference analogue: Accelerate's process-group
    init at train_brushnet_mirror.py:902-907 raises on bad MASTER_ADDR).
    """
    # NOTE: must not touch jax.process_count()/jax.devices() here — they
    # initialize the XLA backend, after which distributed init always fails.
    if jax.distributed.is_initialized():
        return  # already initialized by the runtime / an earlier call
    explicit = bool(kwargs) or any(
        v in os.environ
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        msg = str(e).lower()
        if "already initialized" in msg or "already been initialized" in msg:
            return
        if explicit:
            raise  # a requested multi-process init must not degrade silently
        # implicit probe on a plain single-host box: nothing to initialize
    except ValueError as e:
        if explicit:
            raise
        # no coordinator/cluster env detected — single-process run
        del e


def is_main_process() -> bool:
    return jax.process_index() == 0


_barrier_seq: dict = {}


def barrier(name: str = "barrier", timeout_ms: int = 600_000) -> None:
    """Cross-process rendezvous via the coordination service (gRPC KV store),
    not a device collective: usable even while other processes are still
    compiling (device collectives — gloo on CPU — have a short rendezvous
    timeout that a compile-time skew between processes can blow).  Barrier
    ids are use-once, so repeated calls with the same name get a sequence
    suffix.  Falls back to sync_global_devices on runtimes without the
    coordination client.
    """
    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed

        client = distributed.global_state.client
    except (ImportError, AttributeError):
        client = None
    if client is not None:
        seq = _barrier_seq[name] = _barrier_seq.get(name, -1) + 1
        client.wait_at_barrier(f"rrtpu:{name}:{seq}", timeout_ms)
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def local_shard(items: Sequence) -> list:
    from reflecting_reality_tpu.parallel.mesh import split_between_processes

    return split_between_processes(items)
