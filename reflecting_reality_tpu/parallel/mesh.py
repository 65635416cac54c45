"""Device-mesh utilities (SURVEY.md §2.2).

The reference's two parallelism strategies map to:
- DDP training (reference: train_brushnet_mirror.py:902-907,1267 — one torch
  process per GPU + NCCL allreduce via HF Accelerate) → a single-program
  `jax.jit` over a 1-D "data" mesh axis: params replicated, batch sharded,
  gradient psum inserted by XLA over ICI.
- Embarrassingly-parallel inference/eval sharding (reference:
  test_brushnet.py:163-168 PartialState.split_between_processes) →
  `split_between_processes` below, a static round-robin split by
  jax.process_index for multi-host fleets.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data",
                   batch_axis: int = 0) -> NamedSharding:
    """Shard the batch dim (default: leading); everything else replicated.

    batch_axis=1 serves stacked multi-step super-batches of shape
    (steps_per_dispatch, batch, ...) — the scan axis stays replicated and
    the per-step batch is data-parallel."""
    return NamedSharding(mesh, P(*([None] * batch_axis), axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis_name: str = "data",
                from_process_local: Optional[bool] = None,
                batch_axis: int = 0):
    """Put a host batch dict onto the mesh, sharded along the batch dim.

    Single-host: a plain sharded device_put of the global batch.
    Multi-host (process_count > 1, or forced via `from_process_local`): each
    host holds only its LOCAL slice of the global batch (see
    data.loader.DataLoader process striding); the slices are assembled into
    one global jax.Array with jax.make_array_from_process_local_data — the
    TPU-native equivalent of the reference's per-rank DataLoader + DDP
    (train_brushnet_mirror.py:1242-1269)."""
    sh = batch_sharding(mesh, axis_name, batch_axis)
    if from_process_local is None:
        from_process_local = jax.process_count() > 1
    if not from_process_local:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

    def put(x):
        x = np.asarray(x)
        global_shape = list(x.shape)
        global_shape[batch_axis] *= jax.process_count()
        return jax.make_array_from_process_local_data(sh, x, tuple(global_shape))

    return jax.tree_util.tree_map(put, batch)


def _transfer_chunk_bytes(default: int = 1 << 26) -> int:
    """In-flight transfer bound (bytes). Override: RR_TRANSFER_CHUNK_BYTES."""
    import os

    try:
        return int(os.environ.get("RR_TRANSFER_CHUNK_BYTES", default))
    except ValueError:
        return default


class TransferStalled(RuntimeError):
    """A bulk device transfer made no progress within the stall timeout.

    Raised instead of blocking forever: a relayed/remote TPU transport can
    drop mid-transfer and never complete the outstanding copy, which parks
    the process in an uninterruptible device wait.  Failing fast lets a
    wrapper (e.g. launchers/train_tpu_e2e.sh's retry loop) restart the
    process and resume from the last checkpoint."""


def _transfer_timeout_s(default: float = 600.0) -> float:
    """Per-chunk stall timeout (seconds); 0 disables. RR_TRANSFER_TIMEOUT_S."""
    import os

    try:
        return float(os.environ.get("RR_TRANSFER_TIMEOUT_S", default))
    except ValueError:
        return default


def _timed_get(arrays, what: str):
    """jax.device_get with a stall timeout (see TransferStalled).  Runs the
    blocking fetch in a worker thread; if it does not finish in time the
    worker is abandoned (daemonic — the process is expected to exit)."""
    timeout = _transfer_timeout_s()
    if not timeout:
        return jax.device_get(arrays)
    import threading

    out, err = [], []

    def run():
        try:
            out.append(jax.device_get(arrays))
        except BaseException as e:  # surfaced below
            err.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        raise TransferStalled(
            f"{what}: no completion within {timeout:.0f}s "
            f"(RR_TRANSFER_TIMEOUT_S) — transport presumed wedged")
    if err:
        raise err[0]
    return out[0]


def put_tree(tree, target, sync_every_bytes: int | None = None):
    """device_put a host pytree with BOUNDED in-flight transfer.

    `target` is a Sharding or a Device.  A naive tree_map(device_put)
    enqueues every leaf at once; on a relayed / remote TPU backend (this
    environment: a stdio-multiplexed tunnel with seconds of latency),
    thousands of concurrent multi-GB async transfers can wedge the
    transport.  Chunking bounds the outstanding data: after
    ~sync_every_bytes of puts, a fixed 1-element probe array is round-
    tripped through the same device — h2d transfers drain FIFO, so the
    probe's arrival implies the chunk landed.  The probe is a pure
    transfer (no eager op, no per-shape compiles).  On a local backend the
    syncs are <1 ms each."""
    import numpy as np

    if sync_every_bytes is None:
        sync_every_bytes = _transfer_chunk_bytes()
    probe = np.zeros((1,), np.float32)

    def _sync():
        np.asarray(_timed_get(jax.device_put(probe, target), "put_tree sync"))

    import os
    import time

    # optional inter-chunk pause (seconds): gives a flaky relay transport
    # breathing room between bulk chunks; 0 (default) on healthy links.
    try:
        pace = float(os.environ.get("RR_TRANSFER_PACE_S", 0.0))
    except ValueError:
        pace = 0.0

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out, pending = [], 0
    for x in leaves:
        out.append(jax.device_put(x, target))
        pending += int(getattr(x, "nbytes", 0) or 0)
        if pending >= sync_every_bytes:
            _sync()
            pending = 0
            if pace:
                time.sleep(pace)
    if pending:
        _sync()
    return jax.tree_util.tree_unflatten(treedef, out)


def replicate_tree(tree, mesh: Mesh, sync_every_bytes: int | None = None):
    """Replicate a host pytree onto the mesh (bounded in-flight; see put_tree)."""
    return put_tree(tree, replicated(mesh), sync_every_bytes)


def fetch_tree(tree, chunk_bytes: int | None = None):
    """device_get a pytree with BOUNDED in-flight download (the mirror of
    replicate_tree's bounded upload): jax.device_get on a full state starts
    async device->host copies for EVERY leaf at once, which can wedge a
    relayed TPU transport; fetching in ~chunk_bytes batches bounds the
    outstanding data.  Equivalent to jax.device_get on local backends."""
    if chunk_bytes is None:
        chunk_bytes = _transfer_chunk_bytes()
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out, batch, pending = [], [], 0
    for x in leaves:
        batch.append(x)
        pending += int(getattr(x, "nbytes", 0) or 0)
        if pending >= chunk_bytes:
            out.extend(_timed_get(batch, "fetch_tree chunk"))
            batch, pending = [], 0
    if batch:
        out.extend(_timed_get(batch, "fetch_tree tail"))
    return jax.tree_util.tree_unflatten(treedef, out)


def split_between_processes(items: Sequence, process_index: Optional[int] = None,
                            process_count: Optional[int] = None) -> list:
    """Contiguous split of a work list across hosts (reference
    PartialState.split_between_processes semantics: near-equal contiguous
    chunks, earlier ranks get the remainder)."""
    idx = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    items = list(items)
    base, rem = divmod(len(items), n)
    start = idx * base + min(idx, rem)
    end = start + base + (1 if idx < rem else 0)
    return items[start:end]
