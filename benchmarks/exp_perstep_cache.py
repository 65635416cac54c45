"""Experiment: why are cached modes slow under per-step dispatch?

benchmarks/PROFILE.md ("Cached modes under per-step dispatch") left the
root cause open: deepcache-2 at 512² runs 1.12 s via the scan dispatch but
3.4-3.6 s via per_step segments.  This isolates the two candidate factors:

  (1) dispatch count  — vary per_step_chunk so the same 20-step cached
      program runs as 1 / 5 / 10 dispatches;
  (2) the compiled unrolled program itself — a single-dispatch unrolled
      segment (chunk=steps) has zero dispatch overhead, so its time is
      pure XLA-code quality vs the scan's.

Exact-mode rows at the same chunks give the dispatch-overhead control
(exact per-step was measured at scan-parity).

Usage: python benchmarks/exp_perstep_cache.py [--steps 20]
"""

import argparse
import os
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache

enable_default_compilation_cache()

from benchmarks.benchmark_pipeline_512 import build_pipe  # noqa: E402


def run(pipe, steps, dispatch, chunk=None, reps=3):
    H = W = 512
    rs = np.random.RandomState(0)
    kwargs = dict(
        prompt="A perfect plane mirror reflection of a chair",
        image=rs.rand(H, W, 3).astype(np.float32),
        mask=(rs.rand(H, W, 3) > 0.5).astype(np.float32),
        depth=rs.rand(H, W, 1).astype(np.float32),
        height=H, width=W, num_inference_steps=steps,
        guidance_scale=7.5, seed=42,
    )
    if chunk is not None:
        kwargs["per_step_chunk"] = chunk
    t0 = time.time()
    pipe(dispatch=dispatch, **kwargs)
    cold = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        pipe(dispatch=dispatch, **kwargs)
        times.append(time.time() - t0)
    return cold, min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--modes", default="deepcache,exact")
    args = ap.parse_args()
    steps = args.steps

    for mode in args.modes.split(","):
        pipe = build_pipe(jnp.bfloat16)
        pipe.cast_params()
        if mode == "deepcache":
            pipe.enable_deep_cache(2)
        elif mode == "encoder_reuse":
            pipe.enable_encoder_reuse(2)
        print(f"== mode {mode}, {steps} steps ==", flush=True)
        cold, warm = run(pipe, steps, "scan")
        print(f"scan:                 warm {warm:.2f}s (cold {cold:.0f}s)", flush=True)
        for chunk in (steps, steps // 2, 4, 2):
            cold, warm = run(pipe, steps, "per_step", chunk)
            # mirror the pipeline's chunk clamp (brushnet_pipeline.py: cached
            # modes round chunks down to a multiple of the interval, min 2)
            eff = chunk if mode == "exact" else max(2, chunk - chunk % 2)
            nd = -(-steps // eff)
            print(f"per_step chunk={chunk:3d}: warm {warm:.2f}s (cold {cold:.0f}s, ~{nd} dispatches)",
                  flush=True)


if __name__ == "__main__":
    main()
