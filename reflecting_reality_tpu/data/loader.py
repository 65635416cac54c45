"""Batched, prefetching data loader (replaces torch DataLoader + Accelerate
prepare, reference train_brushnet_mirror.py:1242-1269).

Host-side: a thread pool maps dataset.__getitem__ (h5py/PIL release the GIL),
a collate stacks NHWC numpy batches (reference collate_fn :796-835), and
`prefetch_to_device` keeps `prefetch` batches in flight onto the mesh so the
TPU never waits on the host (SURVEY.md §7 stage 6)."""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


def collate(examples) -> Dict[str, np.ndarray]:
    batch = {}
    for key in examples[0]:
        batch[key] = np.ascontiguousarray(np.stack([e[key] for e in examples]))
        if batch[key].dtype == np.float64:
            batch[key] = batch[key].astype(np.float32)
    return batch


class DataLoader:
    """Shuffling, dropping-last, thread-parallel batch loader.

    Multi-host: `batch_size` is always the GLOBAL batch; with
    process_count > 1 every host draws the same shuffled order (same seed)
    and reads only its contiguous slice of each global batch — the
    one-DataLoader-per-rank semantics the reference gets from torch's
    DistributedSampler under Accelerate (train_brushnet_mirror.py:1242-1269).
    The per-host slices are reassembled into one global device array by
    parallel.mesh.shard_batch (jax.make_array_from_process_local_data)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 8, seed: int = 0, drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1):
        assert batch_size % max(process_count, 1) == 0, (
            f"global batch {batch_size} not divisible by process_count {process_count}"
        )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = max(process_count, 1)
        self.local_batch_size = batch_size // self.process_count
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last or self.process_count > 1:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        # item-keyed dataset RNG (data/rng.py): advance its epoch so
        # augmentation draws resample each pass but stay thread-invariant
        ds_rng = getattr(self.dataset, "rng", None)
        if ds_rng is not None and hasattr(ds_rng, "epoch"):
            ds_rng.epoch = self.epoch
        self.epoch += 1

        lo = self.process_index * self.local_batch_size
        # Multi-host: a partial tail batch would give ranks unequal (or
        # empty) local slices and desync the global-array assembly in
        # shard_batch, so the tail is always dropped when process_count > 1
        # (torch DistributedSampler drops/pads the same way).
        drop = self.drop_last or self.process_count > 1
        stop = n - (n % self.batch_size) if drop else n
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            for start in range(0, stop, self.batch_size):
                idxs = order[start + lo : start + lo + self.local_batch_size]
                pending.append(pool.map(self.dataset.__getitem__, idxs))
                # keep 2 batches in flight
                if len(pending) > 2:
                    yield collate(list(pending.pop(0)))
            for fut in pending:
                yield collate(list(fut))


def prefetch_to_device(iterator, mesh=None, size: int | None = None,
                       group: int = 1, transport_dtype=None,
                       transport_exempt: tuple = ()):
    """Wrap a host batch iterator with a device-put prefetch queue.

    With a mesh, batches are sharded on the leading axis (data-parallel);
    otherwise they are device_put to the default device.

    group > 1 stacks consecutive batches into (group, batch, ...)
    super-batches (one upload + one lax.scan dispatch per `group` steps in
    cli/train.py --steps_per_dispatch); a partial group at iterator
    exhaustion is yielded with a shorter leading dim, never dropped.

    transport_dtype (e.g. jnp.bfloat16) casts float32 arrays on the HOST
    before upload, halving host->device bytes.  Bit-identical to uploading
    f32 whenever the train step consumes every float input through
    .astype(compute_dtype) (training/train_step.py does: pixels/moments via
    the VAE-encode cast, masks/depths via selection-only nearest resize then
    cast) — the cast merely moves across the wire.  Integer arrays
    (input_ids) are never touched.  Keys in transport_exempt stay fp32:
    cli/train.py exempts 'normals' under normals_conditioning_mode=
    'ip_adapter', where the step consumes the raw mirror-normal vector at
    fp32 through freq_encode (bands to 2^5 — bf16 rounding of the vector
    would change the encoding, breaking the bit-identical invariant).

    size is the prefetch queue depth; queued + in-flight super-batches pin
    up to (size + 1) * group global batches of input data in HBM, so the
    default is 2 for group=1 but 1 when group>1 (one super-batch ahead
    already amortizes dispatch latency — don't K-fold the HBM footprint)."""
    import numpy as np
    import jax

    if transport_dtype is not None:
        tdtype = np.dtype(transport_dtype)

        def cast(x):
            x = np.asarray(x)
            return x.astype(tdtype) if x.dtype == np.float32 else x

        def cast_batch(b):
            if isinstance(b, dict):
                return {k: (v if k in transport_exempt
                            else jax.tree_util.tree_map(cast, v))
                        for k, v in b.items()}
            return jax.tree_util.tree_map(cast, b)
    else:
        cast_batch = lambda b: b

    if mesh is not None:
        from reflecting_reality_tpu.parallel.mesh import shard_batch

        put = lambda b, ax=0: shard_batch(cast_batch(b), mesh, batch_axis=ax)
    else:
        put = lambda b, ax=0: jax.device_put(cast_batch(b))

    if group > 1:
        base = iterator

        def grouped():
            buf = []
            for b in base:
                buf.append(b)
                if len(buf) == group:
                    yield jax.tree_util.tree_map(lambda *xs: np.stack(xs), *buf)
                    buf = []
            if buf:
                yield jax.tree_util.tree_map(lambda *xs: np.stack(xs), *buf)

        iterator = grouped()
        inner_put = put
        put = lambda b: inner_put(b, 1)

    if size is None:
        size = 1 if group > 1 else 2
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item
