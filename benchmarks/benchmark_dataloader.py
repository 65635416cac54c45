"""Host-side input-pipeline throughput (SynMirror HDF5 -> collated batches).

The training step consumes 13.8 samples/s per chip (benchmark_train_step.py);
a v5e-8 host must therefore sustain >110 samples/s from the loader or the
input pipeline becomes the wall.  The reference never measures this (its
torch DataLoader with 4 workers is assumed fast enough on 8-GPU nodes,
train_brushnet_mirror.py:1242-1248); we do.

Builds a synthetic SynMirror shard (same keys/dtypes/shapes as
extract_data_from_hdf5 expects: colors u8 HWC, category_id_segmaps u8,
depth f32, normals f32, cam_states json bytes), then times HDF5Dataset +
DataLoader end to end (read + transforms + tokenize + collate).

Usage: python benchmarks/benchmark_dataloader.py [--source_res 512]
       [--n_files 64] [--batch 16] [--workers 8] [--seconds 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_shard(root: Path, n: int, res: int) -> "object":
    import h5py
    import pandas as pd

    rng = np.random.RandomState(0)
    rows = []
    for i in range(n):
        p = root / f"{i:04d}.hdf5"
        seg = np.zeros((res, res), np.uint8)
        seg[res // 4 : res // 2, res // 4 : res // 2] = 1  # mirror
        seg[res // 2 :, res // 2 :] = 2  # object
        cam = json.dumps({
            "cam2world": np.eye(4).tolist(),
            "cam_K": np.eye(3).tolist(),
        }).encode("utf-8")
        with h5py.File(p, "w") as f:
            f["colors"] = rng.randint(0, 255, (res, res, 3), dtype=np.uint8)
            f["category_id_segmaps"] = seg
            f["depth"] = rng.rand(res, res).astype(np.float32) * 4.0
            f["normals"] = rng.rand(res, res, 3).astype(np.float32)
            f["cam_states"] = np.frombuffer(cam, dtype=np.uint8)
        rows.append({"path": p.name, "auto_caption": "a red cube on a table"})
    return pd.DataFrame(rows)


def _process_worker(root, df_pickle, resolution, stride, offset, seconds,
                    barrier, q):
    """One emulated core: iterate the dataset single-threaded over a
    disjoint slice; report samples processed.  The barrier keeps process
    spawn/import time out of the measured window."""
    import pickle

    from reflecting_reality_tpu.data.synmirror import HDF5Dataset
    from reflecting_reality_tpu.data.tokenizer import HashTokenizer

    ds = HDF5Dataset(root, pickle.loads(df_pickle), HashTokenizer(49408),
                     resolution=resolution, depth=True, seed=offset)
    ds[offset]  # warm
    barrier.wait()
    n = 0
    deadline = time.perf_counter() + seconds
    i = offset
    while time.perf_counter() < deadline:
        ds[i % len(ds)]
        i += stride
        n += 1
    q.put(n)


def multiprocess_aggregate(root, df, resolution, n_procs, seconds):
    """Aggregate samples/s over n_procs worker PROCESSES (emulating cores on
    a 1-vCPU box).  aggregate(N)/aggregate(1) ~ 1.0 on one core proves the
    per-sample work has no cross-worker serialization (HDF5 file locks,
    shared caches); on an N-core host the same structure scales to ~N x the
    single-thread rate because the pixel kernels release the GIL
    (benchmarks/gil_probe.py)."""
    import multiprocessing as mp
    import pickle

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    barrier = ctx.Barrier(n_procs + 1)
    df_p = pickle.dumps(df)
    procs = [
        ctx.Process(target=_process_worker,
                    args=(str(root), df_p, resolution, n_procs, i, seconds,
                          barrier, q))
        for i in range(n_procs)
    ]
    for p in procs:
        p.start()
    barrier.wait()  # all workers imported + warmed; clock starts now
    t0 = time.perf_counter()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source_res", type=int, default=512,
                    help="render resolution of the synthetic shard "
                         "(512 = no-resize fast path; 640 = resize path)")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--n_files", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--processes", type=int, default=0,
                    help="also measure N-process aggregate throughput "
                         "(cross-worker contention check)")
    args = ap.parse_args()

    from reflecting_reality_tpu.data.loader import DataLoader
    from reflecting_reality_tpu.data.synmirror import HDF5Dataset
    from reflecting_reality_tpu.data.tokenizer import HashTokenizer

    # tokenization is <1% of per-sample time (short captions); the hash
    # stand-in keeps the benchmark hermetic (no vocab files needed).
    tok = HashTokenizer(vocab_size=49408)
    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        df = make_shard(root, args.n_files, args.source_res)
        ds = HDF5Dataset(str(root), df, tok, resolution=args.resolution,
                         depth=True, random_flip=True, seed=0)

        # warm one sample (file cache, tokenizer tables)
        ds[0]

        loader = DataLoader(ds, batch_size=args.batch,
                            num_workers=args.workers, seed=0)
        # warm one full epoch (file cache, thread pool), then time whole
        # epochs until the deadline (mid-epoch breaks would leak the pool).
        for batch in loader:
            pass
        n_samples = 0
        t0 = time.perf_counter()
        deadline = t0 + args.seconds
        while time.perf_counter() < deadline:
            for batch in loader:
                n_samples += batch["pixel_values"].shape[0]
        dt = time.perf_counter() - t0
        sps = n_samples / dt

        # single-thread per-sample latency for the breakdown
        t0 = time.perf_counter()
        for i in range(16):
            ds[i % len(ds)]
        lat_ms = (time.perf_counter() - t0) / 16 * 1e3

    need = 13.8 * 8  # samples/s to feed a v5e-8 at the measured step rate
    print(f"dataloader: {sps:.1f} samples/s "
          f"(batch {args.batch}, {args.workers} workers, "
          f"source {args.source_res} -> {args.resolution}); "
          f"1-thread latency {lat_ms:.1f} ms/sample; "
          f"v5e-8 needs {need:.0f} samples/s -> "
          f"{'OK' if sps > need else 'BOTTLENECK'} ({sps / need:.1f}x)",
          flush=True)

    if args.processes:
        with tempfile.TemporaryDirectory() as tmp:
            root = Path(tmp)
            df = make_shard(root, args.n_files, args.source_res)
            one = multiprocess_aggregate(root, df, args.resolution, 1, args.seconds)
            many = multiprocess_aggregate(root, df, args.resolution,
                                          args.processes, args.seconds)
        print(f"multiprocess contention check: 1 proc {one:.1f} samples/s, "
              f"{args.processes} procs aggregate {many:.1f} samples/s "
              f"(ratio {many / one:.2f}; ~1.0 on a 1-core box means no "
              "cross-worker serialization)", flush=True)


if __name__ == "__main__":
    main()
