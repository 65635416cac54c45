"""Flash-attention kernel tuning at the headline shape (VERDICT r5 item 1).

The committed per-op trace (PROFILE.md "Round 5") shows the 5 x 4096-token
self-attention custom-calls are the largest single-kernel headroom: 1.04 ms
each at 67% of the padded-FLOPs hardware floor (the floor itself is real:
a D=40 contraction costs one 128-lane MXU pass, so padded FLOPs = MXU work).
This sweep measures candidate block shapes, an exp2 softmax variant, and
jax's own pallas TPU flash kernel on the exact shape (B=2, H=8, T=4096,
D=40, bf16) with two-point chained timing.

Usage: python benchmarks/benchmark_flash_tuning.py [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache

enable_default_compilation_cache()

import jax
import jax.numpy as jnp

from reflecting_reality_tpu.ops.pallas import flash_attention as fa

B, H, T, D = 2, 8, 4096, 40


def chained(fn, q, k, v, n1=50, n2=350, reps=3):
    """Two-point chained timing: output feeds next q."""

    def loop(n):
        @jax.jit
        def run(q):
            def body(q, _):
                o = fn(q, k, v)
                return o, ()

            q, _ = jax.lax.scan(body, q, None, length=n)
            return q

        return run

    r1, r2 = loop(n1), loop(n2)
    np.asarray(r1(q)); np.asarray(r2(q))  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); np.asarray(r1(q)); t1 = time.time() - t0
        t0 = time.time(); np.asarray(r2(q)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, T, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, T, H, D), jnp.bfloat16)

    padded_flops = 4 * B * H * T * T * 128  # the MXU-pass floor basis
    rows = []

    # correctness reference (fp32 einsum softmax attention)
    def ref(q, k, v):
        qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) / (D ** 0.5)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, vf).astype(q.dtype)

    want = np.asarray(jax.jit(ref)(q, k, v), np.float32)

    def report(name, fn):
        got = np.asarray(jax.jit(fn)(q, k, v), np.float32)
        err = float(np.max(np.abs(got - want)))
        if err > 0.02:
            print(f"{name:<34} WRONG (max|diff|={err:.4f}) — skipped", flush=True)
            return
        t = chained(fn, q, k, v, reps=args.reps)
        eff = padded_flops / t / 197e12
        rows.append((name, t * 1e3, eff))
        print(f"{name:<34} {t*1e3:7.3f} ms  {eff*100:5.1f}% of padded peak "
              f"(max|diff| {err:.4f})", flush=True)

    # current production kernel + block sweep
    for bq, bk in [(1024, 1024), (512, 1024), (1024, 512), (512, 2048),
                   (2048, 512), (512, 512), (256, 1024), (1024, 2048),
                   (2048, 1024)]:
        try:
            report(f"ours bq={bq} bk={bk}",
                   functools.partial(fa.flash_attention, block_q=bq, block_k=bk))
        except Exception as e:
            print(f"ours bq={bq} bk={bk}: FAILED {str(e)[:120]}", flush=True)

    # jax reference TPU kernel (B, H, T, D layout)
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention as jax_flash)

        def jax_fa(q, k, v):
            qt = jnp.swapaxes(q, 1, 2)  # (B, H, T, D)
            kt = jnp.swapaxes(k, 1, 2)
            vt = jnp.swapaxes(v, 1, 2)
            o = jax_flash(qt, kt, vt, sm_scale=float(1.0 / D ** 0.5))
            return jnp.swapaxes(o, 1, 2)

        report("jax pallas tpu flash (default)", jax_fa)

        def jax_fa_blocks(bq, bkmajor, bk):
            bs = BlockSizes(block_q=bq, block_k_major=bkmajor, block_k=bk,
                            block_b=1,
                            block_q_major_dkv=bq, block_k_major_dkv=bkmajor,
                            block_q_dkv=bq, block_k_dkv=bk,
                            block_q_dq=bq, block_k_dq=bk,
                            block_k_major_dq=bkmajor)

            def f(q, k, v):
                qt = jnp.swapaxes(q, 1, 2)
                kt = jnp.swapaxes(k, 1, 2)
                vt = jnp.swapaxes(v, 1, 2)
                o = jax_flash(qt, kt, vt, sm_scale=float(1.0 / D ** 0.5),
                              block_sizes=bs)
                return jnp.swapaxes(o, 1, 2)
            return f

        for bq, bkm, bk in [(1024, 1024, 1024), (2048, 2048, 2048),
                            (512, 1024, 512), (1024, 4096, 1024),
                            (2048, 4096, 2048), (4096, 4096, 4096)]:
            try:
                report(f"jax flash bq={bq} bkm={bkm} bk={bk}",
                       jax_fa_blocks(bq, bkm, bk))
            except Exception as e:
                print(f"jax flash {bq}/{bkm}/{bk}: FAILED {str(e)[:120]}",
                      flush=True)
    except ImportError as e:
        print(f"jax flash unavailable: {e}")

    best = min(rows, key=lambda r: r[1])
    print(f"\nbest: {best[0]} at {best[1]:.3f} ms ({best[2]*100:.1f}%)")
    if args.out:
        with open(args.out, "a") as f:
            for name, ms, eff in rows:
                f.write(f"flash_tuning_4096,{name},{ms:.3f},{eff:.3f}\n")


if __name__ == "__main__":
    main()
