"""Serving throughput/latency: the HTTP micro-batcher vs serial serving.

Stands up the real serving stack — SD-1.5-sized pipeline (random weights),
BatchingPipelineServer, ThreadingHTTPServer — on the local chip and fires
concurrent /generate requests with distinct b64-PNG inputs, the way a real
client fleet would.  Reports wall-clock images/s and per-request p50/p99
latency for each --max_batch setting, and appends rows to results.csv.

The interesting comparison: max_batch=1 serializes requests at the bs1 rate
(0.82 images/s at 512²), while max_batch=4 drains the queue into padded
bucket-4 batched calls (0.92 images/s of device rate, results.csv
denoise_512_bs4) and overlaps every request's host-side PNG decode/encode
with the chip.  int8 widens the gap (1.10 images/s at bs4).

Usage: python benchmarks/benchmark_serving.py [--steps 50] [--requests 8]
         [--max_batch 1,4] [--int8]
"""

import argparse
import base64
import io
import json
import os
import statistics
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache

enable_default_compilation_cache()

from benchmark_pipeline_512 import build_pipe
from reflecting_reality_tpu.cli.serve import (
    BatchingPipelineServer,
    PipelineServer,
    make_handler,
)

H = W = 512


def png_b64(arr_uint8):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr_uint8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def request_payload(i, steps):
    rs = np.random.RandomState(100 + i)
    mask = np.zeros((H, W), np.uint8)
    mask[128:384, 128:384] = 255
    return {
        "prompt": f"A perfect plane mirror reflection of object {i}",
        "image": png_b64(rs.randint(0, 256, (H, W, 3), np.uint8)),
        "mask": png_b64(mask),
        "depth": png_b64(rs.randint(0, 256, (H, W), np.uint8)),
        "num_inference_steps": steps,
        "seed": i,
    }


def post(url, payload):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=3600) as r:
        return json.loads(r.read())


def run_wave(url, payloads):
    """Fire all payloads concurrently; return (wall_s, [latency_s...])."""
    lat = [None] * len(payloads)

    def go(k):
        t0 = time.time()
        body = post(url, payloads[k])
        assert len(body["images"]) == 1
        lat[k] = time.time() - t0

    threads = [threading.Thread(target=go, args=(k,)) for k in range(len(payloads))]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.time() - t0, lat


def bench_mode(pipe, max_batch, steps, n_requests, window=0.0):
    if max_batch > 1:
        server = BatchingPipelineServer(pipe, default_steps=steps,
                                        max_batch=max_batch,
                                        batch_window_s=window)
    else:
        server = PipelineServer(pipe, default_steps=steps)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}"
    try:
        # warm every bucket the wave will hit (solo + full bucket)
        t0 = time.time()
        post(url, request_payload(0, steps))
        if max_batch > 1:
            run_wave(url, [request_payload(i, steps)
                           for i in range(max_batch)])
        print(f"mb={max_batch}: warmed in {time.time() - t0:.1f}s", flush=True)

        payloads = [request_payload(i, steps) for i in range(n_requests)]
        best = None
        for _ in range(2):
            wall, lat = run_wave(url, payloads)
            if best is None or wall < best[0]:
                best = (wall, lat)
        wall, lat = best
        stats = server.stats()
        return {
            "wall_s": wall,
            "images_per_s": n_requests / wall,
            "p50_s": statistics.median(lat),
            "p99_s": sorted(lat)[max(0, int(0.99 * len(lat)) - 1)],
            "mean_batch": stats.get("mean_batch_size", 1.0),
        }
    finally:
        httpd.shutdown()
        if isinstance(server, BatchingPipelineServer):
            server.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--max_batch", type=str, default="1,4",
                    help="comma-separated micro-batch limits to compare")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--window", type=float, default=0.0,
                    help="batch window (s): hold partial batches for more "
                         "arrivals — raises occupancy when request parsing "
                         "trickles arrivals (GIL-bound PNG decode)")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__),
                                                  "results.csv"))
    args = ap.parse_args()

    pipe = build_pipe(jnp.bfloat16)
    pipe.cast_params()
    if args.int8:
        pipe.enable_int8()
    tag = "_int8" if args.int8 else ""

    rows = []
    for mb in [int(x) for x in args.max_batch.split(",")]:
        r = bench_mode(pipe, mb, args.steps, args.requests, args.window)
        rows.append((mb, r))
        print(f"max_batch={mb}: {r['images_per_s']:.3f} images/s "
              f"(wall {r['wall_s']:.1f}s / {args.requests} requests, "
              f"p50 {r['p50_s']:.2f}s p99 {r['p99_s']:.2f}s, "
              f"mean batch {r['mean_batch']})", flush=True)

    with open(args.out, "a") as f:
        for mb, r in rows:
            wtag = f"_w{args.window:g}" if args.window else ""
            f.write(
                f"serving_512_mb{mb}{wtag}{tag},512,{mb},bf16,"
                f"{round(args.steps * r['images_per_s'], 2)},"
                f"{round(r['images_per_s'], 3)},"
                f"HTTP serving {args.requests} concurrent requests"
                f"{' W8A8 int8' if args.int8 else ''}"
                f"{f' batch window {args.window:g}s' if args.window else ''}: "
                f"p50 {round(r['p50_s'], 2)}s p99 {round(r['p99_s'], 2)}s "
                f"mean batch {r['mean_batch']}\n"
            )
    print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
