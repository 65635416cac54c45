"""GIL-release probe for the host input pipeline (runs on a 1-core box).

PROFILE.md's loader-scaling claim rests on the per-sample pixel work
releasing the GIL so loader THREADS can overlap on a many-core TPU host.
A 1-vCPU box cannot demonstrate multi-core speedup, but it CAN prove GIL
release: a sleeping probe thread that wakes every 1 ms must reacquire the
GIL to run.  If the worker thread holds the GIL across a long native call
(tens of ms), the probe's wake latency spikes to the call duration; if the
call releases the GIL, wake latency stays at scheduler granularity.

    python -m benchmarks.gil_probe        # prints one JSON line

tests/test_loader_scaling.py asserts the discrimination.
"""

from __future__ import annotations

import json
import threading
import time


def wake_latency_p95(work_fn, seconds: float = 2.0) -> float:
    """p95 extra latency (s) of a 1 ms-sleep probe thread while `work_fn`
    runs back-to-back in another thread."""
    stop = threading.Event()
    lats = []

    def probe():
        while not stop.is_set():
            t0 = time.perf_counter()
            time.sleep(0.001)
            lats.append(time.perf_counter() - t0 - 0.001)

    def worker():
        while not stop.is_set():
            work_fn()

    pt = threading.Thread(target=probe)
    wt = threading.Thread(target=worker)
    pt.start()
    wt.start()
    time.sleep(seconds)
    stop.set()
    wt.join()
    pt.join()
    lats.sort()
    return lats[int(len(lats) * 0.95)] if lats else float("nan")


def make_workloads(resolution: int = 512, src: int = 640):
    """(gil_released_call, gil_held_call): the SAME C kernel through
    ctypes.CDLL (releases the GIL — the production path) vs ctypes.PyDLL
    (holds the GIL for the call's whole duration).  Identical work, so the
    probe isolates exactly the GIL behavior."""
    import ctypes

    import numpy as np

    from reflecting_reality_tpu.data import native

    if native.load() is None:
        raise RuntimeError("native transforms unavailable (g++/source missing?)")

    img = np.ascontiguousarray(
        np.random.RandomState(0).randint(0, 256, (src, src, 3), np.uint8))
    out = np.empty((resolution, resolution, 3), np.float32)

    so_path = str(native.Path(native.__file__).with_name(native._SO_NAME))
    released = ctypes.CDLL(so_path)
    held = ctypes.PyDLL(so_path)
    for lib in (released, held):
        lib.rr_rgb_transform.argtypes = [
            native._u8, native._i, native._i, native._i, native._i, native._f32]

    def gil_released_call():
        released.rr_rgb_transform(img, src, src, 3, resolution, out)

    def gil_held_call():
        held.rr_rgb_transform(img, src, src, 3, resolution, out)

    t0 = time.perf_counter()
    for _ in range(3):
        gil_released_call()
    per_call = (time.perf_counter() - t0) / 3

    return gil_released_call, gil_held_call, per_call


def main():
    released, held, per_call = make_workloads()
    p95_released = wake_latency_p95(released)
    p95_held = wake_latency_p95(held)
    print(json.dumps({
        "per_call_s": round(per_call, 4),
        "probe_wake_p95_released_s": round(p95_released, 4),
        "probe_wake_p95_gil_held_s": round(p95_held, 4),
        "native_releases_gil": p95_released < p95_held / 3,
    }))


if __name__ == "__main__":
    main()
