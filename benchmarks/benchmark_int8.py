"""Does the v5e int8 MXU path pay off for SD-1.5-shaped convs/GEMMs?

v5e peak is 394 TOPS int8 vs 197 TFLOPS bf16.  The exact denoise step is
conv/GEMM-bound (benchmarks/PROFILE.md "Ceiling evidence"), so if XLA lowers
int8 convolutions / dot_generals to the int8 MXU mode, a W8A8 quantized
serving mode could approach 2x on the conv share of the step.  This probes
the representative SD-1.5 UNet shapes (512^2 input, CFG batch 2) before any
quantization machinery is built.

Two-point chained-loop timing per axon relay rules (.claude/skills/verify).

Usage: python benchmarks/benchmark_int8.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 2

# (H, W, Cin, Cout) 3x3 stride-1 convs of the 512^2 UNet trunk
CONV_SHAPES = [
    (64, 64, 320, 320),
    (32, 32, 640, 640),
    (16, 16, 1280, 1280),
    (8, 8, 1280, 1280),
]

# (M, K, N) GEMMs: GEGLU up/down at level 0/1, attention out-proj
GEMM_SHAPES = [
    (4096, 320, 2560),
    (4096, 1280, 320),
    (1024, 640, 5120),
    (256, 1280, 10240),
]


def timed_chain(step, x0, n1, n2, reps=3):
    def chain(n, x):
        return jax.lax.fori_loop(0, n, lambda _, x: step(x), x)

    j1 = jax.jit(lambda x: chain(n1, x))
    j2 = jax.jit(lambda x: chain(n2, x))
    np.asarray(j1(x0))
    np.asarray(j2(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); np.asarray(j1(x0)); t1 = time.time() - t0
        t0 = time.time(); np.asarray(j2(x0)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (n2 - n1) * 1000.0)
    return best


def _feedback(y, shape, dtype):
    """Build the next chain input of `shape` from y (keeps the data dependency
    so XLA cannot hoist the body; same elementwise cost for all variants)."""
    m = int(np.prod(shape))
    flat = y.reshape(-1)
    reps = -(-m // flat.shape[0])
    if reps > 1:
        flat = jnp.tile(flat, reps)
    return jax.lax.slice(flat, (0,), (m,)).reshape(shape).astype(dtype)


def bench_conv(h, w, cin, cout):
    flops = 2.0 * B * h * w * cin * cout * 9
    n2 = int(min(max(2000.0 / max(flops / 150e9, 0.02), 50), 20000))
    n1 = max(n2 // 5, 10)

    kb = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.bfloat16)
    x0b = jax.random.normal(jax.random.PRNGKey(0), (B, h, w, cin), jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x0b.shape, kb.shape, ("NHWC", "HWIO", "NHWC"))

    def step_bf16(x):
        y = jax.lax.conv_general_dilated(
            x, kb, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return _feedback(y, x.shape, x.dtype)

    ki = jax.random.randint(jax.random.PRNGKey(1), (3, 3, cin, cout), -127, 127, jnp.int8)
    x0i = jax.random.randint(jax.random.PRNGKey(0), (B, h, w, cin), -127, 127, jnp.int8)

    def step_int8(x):
        y = jax.lax.conv_general_dilated(
            x, ki, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return _feedback(y >> 8, x.shape, x.dtype)

    # conv as implicit GEMM: 9 shifted dots accumulate into int32 (avoids
    # materializing the 9x im2col patches; each shift is a cheap roll)
    ki_g = ki.reshape(9, cin, cout)

    def step_int8_shifted(x):
        acc = jnp.zeros((B, h, w, cout), jnp.int32)
        idx = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xs = jnp.roll(x, (dy, dx), axis=(1, 2))
                acc = acc + jax.lax.dot_general(
                    xs, ki_g[idx], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                idx += 1
        return _feedback(acc >> 8, x.shape, x.dtype)

    ms_b = timed_chain(step_bf16, x0b, n1, n2)
    try:
        ms_i = timed_chain(step_int8, x0i, n1, n2)
    except Exception as e:  # pragma: no cover - probe
        print(f"  int8 conv failed: {type(e).__name__}: {e}")
        ms_i = float("nan")
    try:
        ms_s = timed_chain(step_int8_shifted, x0i, n1, n2)
    except Exception as e:  # pragma: no cover - probe
        print(f"  int8 shifted-gemm conv failed: {type(e).__name__}: {e}")
        ms_s = float("nan")
    return ms_b, ms_i, ms_s, flops


def bench_gemm(m, k, n):
    flops = 2.0 * m * k * n
    n2 = int(min(max(2000.0 / max(flops / 150e9, 0.02), 50), 20000))
    n1 = max(n2 // 5, 10)

    wb = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
    x0b = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)

    def step_bf16(x):
        y = jax.lax.dot_general(x, wb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return _feedback(y, x.shape, x.dtype)

    wi = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 127, jnp.int8)
    x0i = jax.random.randint(jax.random.PRNGKey(0), (m, k), -127, 127, jnp.int8)

    def step_int8(x):
        y = jax.lax.dot_general(x, wi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return _feedback(y >> 8, x.shape, x.dtype)

    ms_b = timed_chain(step_bf16, x0b, n1, n2)
    try:
        ms_i = timed_chain(step_int8, x0i, n1, n2)
    except Exception as e:  # pragma: no cover - probe
        print(f"  int8 gemm failed: {type(e).__name__}: {e}")
        ms_i = float("nan")
    return ms_b, ms_i, flops


def main():
    print("conv (NHWC 3x3, batch 2):")
    print("shape,bf16_ms,int8_conv_ms,int8_shifted_ms,best_speedup,bf16_tflops")
    for h, w, cin, cout in CONV_SHAPES:
        ms_b, ms_i, ms_s, flops = bench_conv(h, w, cin, cout)
        print(f"{h}x{w}x{cin}->{cout},{ms_b:.4f},{ms_i:.4f},{ms_s:.4f},"
              f"{ms_b / min(ms_i, ms_s):.2f},{flops / ms_b / 1e9:.1f}", flush=True)

    print("\ngemm:")
    print("shape,bf16_ms,int8_ms,speedup,bf16_tflops")
    for m, k, n in GEMM_SHAPES:
        ms_b, ms_i, flops = bench_gemm(m, k, n)
        print(f"{m}x{k}x{n},{ms_b:.4f},{ms_i:.4f},"
              f"{ms_b / ms_i:.2f},{flops / ms_b / 1e9:.1f}", flush=True)


if __name__ == "__main__":
    main()
