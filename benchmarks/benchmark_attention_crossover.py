"""Pallas-vs-XLA attention crossover at each SD-1.5 self-attention shape.

The UNet runs self-attention at four spatial resolutions; for 512² inputs and
CFG batch 2 the (T, H, D) shapes are (4096,8,40), (1024,8,80), (256,8,160),
(64,8,160)(mid).  Round 1 measured only T=4096 (Pallas 1.61 ms vs XLA
2.99 ms) and asserted the rest; this pins the whole table so the dispatch
threshold in ops.attention is measured, not asserted (VERDICT weak item 3).

Two-point chained-loop timing (axon relay rules: the output feeds the next
iteration's q; time two iteration counts; divide the difference).

Usage: python benchmarks/benchmark_attention_crossover.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflecting_reality_tpu.ops.attention import dot_product_attention
from reflecting_reality_tpu.ops.pallas.flash_attention import flash_attention

# (T, H, D) per UNet level at 512², CFG batch 2; plus 1024² level-0.
SHAPES = [
    (16384, 8, 40),   # 1024² level 0
    (4096, 8, 40),    # 512² level 0
    (1024, 8, 80),    # level 1
    (256, 8, 160),    # level 2
    (64, 8, 160),     # mid
]
B = 2


def timed_chain(fn, q, k, v, n1, n2, reps=3):
    """Two-point chained-loop timing, min over reps (relay noise is ~100 ms
    per dispatch; n2 must be large enough that n2*ms_iter >> noise)."""
    def chain(n, q):
        def body(_, q):
            return fn(q, k, v).astype(q.dtype)
        return jax.lax.fori_loop(0, n, body, q)

    j1 = jax.jit(lambda q: chain(n1, q))
    j2 = jax.jit(lambda q: chain(n2, q))
    np.asarray(j1(q))  # compile
    np.asarray(j2(q))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); np.asarray(j1(q)); t1 = time.time() - t0
        t0 = time.time(); np.asarray(j2(q)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (n2 - n1) * 1000.0)
    return best  # ms/iter


def main():
    rows = []
    for t, h, d in SHAPES:
        rng = jax.random.PRNGKey(0)
        q = jax.random.normal(rng, (B, t, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, t, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, t, h, d), jnp.bfloat16)

        # aim for ~2 s of loop compute at the rough expected ms/iter
        est_ms = max(4.0 * B * h * t * t * max(d, 128) / 200e9, 0.02)
        n2 = int(min(max(2000.0 / est_ms, 50), 20000))
        n1 = max(n2 // 5, 10)

        # XLA einsum materializes (B*H, T, T) fp32 logits; at 16384 tokens
        # that's 16 GB — OOM on one chip, flash is mandatory, skip the probe.
        logits_gb = B * h * t * t * 4 / 2**30
        if logits_gb < 4.0:
            ms_xla = timed_chain(
                lambda q, k, v: dot_product_attention(q, k, v, backend="xla"),
                q, k, v, n1, n2,
            )
        else:
            ms_xla = float("inf")
        ms_flash = timed_chain(flash_attention, q, k, v, n1, n2)
        winner = "flash" if ms_flash < ms_xla else "xla"
        xs = "oom(skip)" if ms_xla == float("inf") else f"{ms_xla:7.3f} ms"
        rows.append((t, h, d, ms_xla, ms_flash, winner))
        print(f"T={t:6d} H={h} D={d:4d}  xla {xs}   "
              f"flash {ms_flash:7.3f} ms   -> {winner}", flush=True)

    print("\ncsv:")
    print("tokens,heads,head_dim,xla_ms,flash_ms,winner")
    for r in rows:
        print(f"{r[0]},{r[1]},{r[2]},{r[3]:.3f},{r[4]:.3f},{r[5]}")


if __name__ == "__main__":
    main()
