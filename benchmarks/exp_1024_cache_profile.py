"""Root-cause the 1024² per-step cached-mode slowdown (VERDICT r4 item 6).

PROFILE.md has carried "root cause remains open" since round 2: DeepCache-2
at 1024² runs ~9.9 s/image under per_step dispatch while the EXACT path
runs 8.7 s — the approximation loses at the resolution where it matters
most, even though the same mode wins 1.26x at 512² under the scan dispatch.

This captures a real device trace of one warm e2e call in each mode and
prints the per-category/per-op comparison, so the extra time is attributed
by measurement instead of hypothesis.  The candidate costs it separates:

  - the cached-step subprogram's own op mix (does the skipped-down/mid
    FLOP saving survive compilation, or does the unrolled segment spill?)
  - cache-pytree traffic at program boundaries (copy/convert/bitcast ops:
    donation failures or cross-program layout flips materialize the ~28
    CFG-doubled residual tensors every dispatch — O(100 MB) at 1024²)
  - scheduling gaps (device self-time vs wall: per_step dispatch overlap)

Usage: python benchmarks/exp_1024_cache_profile.py [--steps 20]
           [--modes exact,deepcache] [--csv_prefix benchmarks/trace_1024]
"""

from __future__ import annotations

import argparse
import csv
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache

enable_default_compilation_cache()

import jax
import jax.numpy as jnp

from benchmarks.benchmark_pipeline_512 import build_pipe
from benchmarks.profile_denoise import find_xspaces, summarize_hlo, tool_table

H = W = 1024


def make_kwargs(steps):
    rs = np.random.RandomState(0)
    mask = np.zeros((H, W, 3), np.float32)
    mask[256:768, 256:768] = 1.0
    return dict(
        prompt="A perfect plane mirror reflection of a chair",
        image=rs.rand(H, W, 3).astype(np.float32), mask=mask,
        depth=rs.rand(H, W, 1).astype(np.float32),
        height=H, width=W, num_inference_steps=steps,
        guidance_scale=7.5, seed=42, dispatch="per_step",
    )


def run_mode(mode, steps, top, csv_prefix):
    pipe = build_pipe(jnp.bfloat16)
    pipe.cast_params()
    if mode == "deepcache":
        pipe.enable_deep_cache(2)
    elif mode == "encoder_reuse":
        pipe.enable_encoder_reuse(2)
    kwargs = make_kwargs(steps)

    print(f"== {mode}: cold run (compiles) ==", flush=True)
    t0 = time.time()
    out = pipe(**kwargs)
    print(f"cold {time.time() - t0:.1f}s", flush=True)
    assert out.shape == (1, H, W, 3)

    warms = []
    for _ in range(2):
        t0 = time.time()
        pipe(**kwargs)
        warms.append(time.time() - t0)
    warm = min(warms)
    print(f"warm {warm:.2f}s e2e ({steps} steps)", flush=True)

    logdir = f"/tmp/rr_trace_1024_{mode}"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        t0 = time.time()
        pipe(**kwargs)
        traced_wall = time.time() - t0

    xspaces = find_xspaces(logdir)
    if not xspaces:
        print("ERROR: no xplane.pb produced", file=sys.stderr)
        return None
    rows = tool_table([xspaces[-1]], "hlo_stats")
    full, total = summarize_hlo(rows, len(rows))

    by_cat = {}
    for r in full:
        c = by_cat.setdefault(r["category"], [0.0, 0])
        c[0] += r["time_us"]
        c[1] += 1
    print(f"\n{mode}: device self-time {total/1e3:.0f} ms, wall {traced_wall:.2f}s "
          f"(gap = dispatch/host/relay {traced_wall - total/1e6:.2f}s)")
    print(f"{'category':<28} {'ms':>9} {'share':>6} {'#ops':>6}")
    for cat, (us, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"{str(cat)[:28]:<28} {us/1e3:>9.1f} {us/total*100:>5.1f}% {n:>6}")
    print(f"\ntop {top} ops:")
    print(f"{'share':>6} {'ms':>8} {'category':<20} {'bound':>8}  name")
    for r in full[:top]:
        print(f"{r['time_us']/total*100:>5.1f}% {r['time_us']/1e3:>8.2f} "
              f"{str(r['category'])[:20]:<20} {str(r['bound_by'] or ''):>8}  "
              f"{str(r['name'])[:70]}")
    if csv_prefix:
        path = f"{csv_prefix}_{mode}_hlo.csv"
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(full[0].keys()))
            w.writeheader()
            w.writerows(full)
        print(f"full table -> {path}")
    return {"warm_s": warm, "device_ms": total / 1e3, "by_cat": by_cat,
            "full": full}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--modes", default="exact,deepcache")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--csv_prefix", default=None)
    args = ap.parse_args()

    results = {}
    for mode in args.modes.split(","):
        results[mode] = run_mode(mode, args.steps, args.top, args.csv_prefix)

    if len(results) == 2 and all(results.values()):
        (ma, ra), (mb, rb) = results.items()
        print(f"\n== diff ({mb} - {ma}) ==")
        cats = set(ra["by_cat"]) | set(rb["by_cat"])
        print(f"{'category':<28} {ma+' ms':>12} {mb+' ms':>12} {'delta':>9}")
        for cat in sorted(cats, key=lambda c: -(rb["by_cat"].get(c, [0, 0])[0]
                                                - ra["by_cat"].get(c, [0, 0])[0])):
            a = ra["by_cat"].get(cat, [0, 0])[0] / 1e3
            b = rb["by_cat"].get(cat, [0, 0])[0] / 1e3
            print(f"{str(cat)[:28]:<28} {a:>12.1f} {b:>12.1f} {b - a:>+9.1f}")
        print(f"\nwall: {ma} {ra['warm_s']:.2f}s vs {mb} {rb['warm_s']:.2f}s; "
              f"device: {ra['device_ms']:.0f} vs {rb['device_ms']:.0f} ms")


if __name__ == "__main__":
    main()
