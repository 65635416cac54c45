"""Loader thread-scaling evidence on a 1-core box (VERDICT round-1 item 8).

Two measurable facts substantiate PROFILE.md's many-core feed-rate claim
without multi-core hardware:

1. The pixel kernels RELEASE the GIL: a 1 ms-sleeping probe thread's wake
   latency stays at scheduler granularity while the production ctypes.CDLL
   path runs, but spikes to the full call duration when the SAME kernel is
   called through ctypes.PyDLL (GIL held).  benchmarks/gil_probe.py.
2. Per-sample work has no cross-worker serialization: N worker PROCESSES on
   one core aggregate to ~the single-process rate (no h5py file-lock or
   shared-state bottleneck).  benchmarks/benchmark_dataloader.py
   --processes.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def native_available():
    from reflecting_reality_tpu.data import native

    if os.environ.get("RR_DISABLE_NATIVE") or native.load() is None:
        pytest.skip("native transforms unavailable")


def test_native_kernels_release_the_gil(native_available):
    from benchmarks.gil_probe import make_workloads, wake_latency_p95

    released, held, per_call = make_workloads()
    assert per_call > 0.005, "workload too short to discriminate"
    # p95 wake latency is load-sensitive on this shared 1-vCPU box (a
    # concurrent TPU-relay job can inflate the released-path latencies);
    # a real GIL hold fails EVERY window, so retry a few quiet windows.
    last = None
    for _ in range(4):
        p95_released = wake_latency_p95(released, seconds=1.5)
        p95_held = wake_latency_p95(held, seconds=1.5)
        last = (p95_released, p95_held, per_call)
        # held: probe blocks for ~the whole call; released: scheduler noise
        if p95_held > per_call * 0.7 and p95_released < p95_held / 3:
            return
    raise AssertionError(
        f"GIL-release signature absent in 4 windows: released={last[0]:.4f}s "
        f"held={last[1]:.4f}s per_call={last[2]:.4f}s")


def test_no_cross_worker_serialization(tmp_path):
    pytest.importorskip("h5py")
    from benchmarks.benchmark_dataloader import make_shard, multiprocess_aggregate

    df = make_shard(tmp_path, 16, 128)
    # The box shares one vCPU with concurrently running TPU-relay jobs, so a
    # single (one, two) pair can land in wildly different load windows.  A
    # REAL shared-resource serialization (h5py lock, shared cache) would
    # depress the 2-proc aggregate in EVERY window; transient external load
    # clears.  Re-measure adjacent pairs until one clean window appears.
    last = None
    for _ in range(4):
        one = multiprocess_aggregate(tmp_path, df, 128, 1, seconds=2.0)
        two = multiprocess_aggregate(tmp_path, df, 128, 2, seconds=2.0)
        last = (one, two)
        if two > one * 0.6:
            return
    raise AssertionError(f"2-proc aggregate persistently below 1-proc: {last}")
