"""Honest W8A8 conv probe: bf16 carry, quantize+dequant inside the body.

benchmark_int8.py's first cut timed int8->int8 chains, which both distorted
the bf16 baseline (float feedback plumbing) and hid the per-call activation
quantize/dequant cost; the full-model benchmark (benchmark_int8_e2e.py) then
measured int8 serving 3.4x SLOWER.  This probe times what the interceptor
actually does per conv: x(bf16) -> quantize -> int8 compute -> dequant ->
bf16, against the plain bf16 conv, for three int8 lowerings:

  lax.conv   int8 conv_general_dilated (XLA picks the lowering)
  shifted    kh*kw zero-padded strided slices, each an int8 dot_general
             accumulated in int32 (explicitly routes onto the int8 MXU)
  im2col     conv_general_dilated_patches + one int8 dot_general

Usage: python benchmarks/benchmark_int8_conv_v2.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 2
SHAPES = [  # (h, w, cin, cout, stride)
    (64, 64, 320, 320, 1),
    (32, 32, 640, 640, 1),
    (16, 16, 1280, 1280, 1),
    (8, 8, 1280, 1280, 1),
    (64, 64, 320, 320, 2),   # downsample
]


def timed_chain(step, x0, n1, n2, reps=3):
    def chain(n, x):
        return jax.lax.fori_loop(0, n, lambda _, x: step(x), x)

    j1 = jax.jit(lambda x: chain(n1, x))
    j2 = jax.jit(lambda x: chain(n2, x))
    np.asarray(j1(x0)); np.asarray(j2(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); np.asarray(j1(x0)); t1 = time.time() - t0
        t0 = time.time(); np.asarray(j2(x0)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (n2 - n1) * 1000.0)
    return best


def quant(x):
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.abs(xf).max(), 1e-12) / 127.0
    return jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8), s


def feedback(y, h, w, cin, stride):
    # bring output back to input shape to close the chain (upsample if strided)
    if stride > 1:
        y = jnp.repeat(jnp.repeat(y, stride, axis=1), stride, axis=2)
    return y[:, :h, :w, :cin].astype(jnp.bfloat16)


def main():
    for h, w, cin, cout, stride in SHAPES:
        flops = 2.0 * B * (h // stride) * (w // stride) * cin * cout * 9
        n2 = int(min(max(1500.0 / max(flops / 150e9, 0.02), 50), 20000))
        n1 = max(n2 // 5, 10)

        kb = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout), jnp.bfloat16)
        wq, s_w = quant(kb)  # per-tensor here; per-channel adds only a (cout,) mul
        x0 = jax.random.normal(jax.random.PRNGKey(0), (B, h, w, cin), jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(x0.shape, kb.shape, ("NHWC", "HWIO", "NHWC"))
        oh, ow = h // stride, w // stride

        def bf16_step(x):
            y = jax.lax.conv_general_dilated(
                x, kb, (stride, stride), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            return feedback(y, h, w, cin, stride)

        def laxconv_step(x):
            xq, s_x = quant(x)
            y = jax.lax.conv_general_dilated(
                xq, wq, (stride, stride), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return feedback(y.astype(jnp.float32) * (s_x * s_w), h, w, cin, stride)

        wg = wq.reshape(9, cin, cout)

        def shifted_step(x):
            xq, s_x = quant(x)
            xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((B, oh, ow, cout), jnp.int32)
            for ky in range(3):
                for kx in range(3):
                    xs = jax.lax.slice(
                        xp, (0, ky, kx, 0),
                        (B, ky + stride * (oh - 1) + 1, kx + stride * (ow - 1) + 1, cin),
                        (1, stride, stride, 1))
                    acc = acc + jax.lax.dot_general(
                        xs, wg[3 * ky + kx], (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            return feedback(acc.astype(jnp.float32) * (s_x * s_w), h, w, cin, stride)

        def im2col_step(x):
            xq, s_x = quant(x)
            patches = jax.lax.conv_general_dilated_patches(
                xq, (3, 3), (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=dn)          # (B, oh, ow, cin*9), channel-major
            wmat = wq.transpose(2, 0, 1, 3).reshape(cin * 9, cout)
            y = jax.lax.dot_general(
                patches, wmat, (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return feedback(y.astype(jnp.float32) * (s_x * s_w), h, w, cin, stride)

        r = {}
        r["bf16"] = timed_chain(bf16_step, x0, n1, n2)
        for name, step in (("lax.conv", laxconv_step), ("shifted", shifted_step),
                           ("im2col", im2col_step)):
            try:
                r[name] = timed_chain(step, x0, n1, n2)
            except Exception as e:
                print(f"  {name} failed: {type(e).__name__}: {e}")
                r[name] = float("nan")
        best = min(v for k, v in r.items() if k != "bf16")
        print(f"{h}x{w}x{cin}->{cout} s{stride}: bf16 {r['bf16']:.4f}  "
              f"lax.conv {r['lax.conv']:.4f}  shifted {r['shifted']:.4f}  "
              f"im2col {r['im2col']:.4f}  best_speedup {r['bf16'] / best:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
