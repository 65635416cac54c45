"""W8A8 int8 serving mode vs exact, at the headline denoise-step shape.

Reuses bench.py's SD-1.5-sized models and two-point chained-scan timing;
quantizes UNet+BrushNet with the production policy (ops.quant.default_select)
and traces the same denoise program under the int8 interceptor.  Also
reports the latent-space deviation of the full 50-step trajectory so the
speedup row comes with a quality number (random weights; the deviation on
trained weights is pinned separately by tests/test_quant.py at tiny scale).

Usage: python benchmarks/benchmark_int8_e2e.py [--batch N]
"""

import argparse
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache

enable_default_compilation_cache()

import bench
from reflecting_reality_tpu.ops.quant import int8_interceptor, quantize_params


def main():
    from reflecting_reality_tpu.ops.attention import set_attention_backend

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    batch = ap.parse_args().batch

    set_attention_backend("flash")
    unet, uparams, brushnet, bparams = bench.build()

    latents = jax.random.normal(jax.random.PRNGKey(2), (batch, 64, 64, 4), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(3), (batch, 64, 64, 6), jnp.float32)
    embeds = jax.random.normal(jax.random.PRNGKey(4), (2 * batch, 77, 768), jnp.float32)
    args = (latents, cond, embeds)

    n1, n2 = 10, 50
    f1 = bench.make_denoise(unet, brushnet, n1, batch)
    f2 = bench.make_denoise(unet, brushnet, n2, batch)
    t1 = bench.timed(f1, (uparams, bparams) + args)
    t2 = bench.timed(f2, (uparams, bparams) + args)
    exact_rate = (n2 - n1) / (t2 - t1)
    exact_final = np.asarray(f2(uparams, bparams, *args), np.float32)

    qu, nu = quantize_params(uparams)
    qb, nb = quantize_params(bparams)
    print(f"quantized kernels: unet {nu}, brushnet {nb}")

    g1 = bench.make_denoise(unet, brushnet, n1, batch)
    g2 = bench.make_denoise(unet, brushnet, n2, batch)

    def timed_q(fn, a):
        # interception happens at trace time; keep every call in the context
        with nn.intercept_methods(int8_interceptor):
            return bench.timed(fn, a)

    t1q = timed_q(g1, (qu, qb) + args)
    t2q = timed_q(g2, (qu, qb) + args)
    int8_rate = (n2 - n1) / (t2q - t1q)
    with nn.intercept_methods(int8_interceptor):
        int8_final = np.asarray(g2(qu, qb, *args), np.float32)

    err = np.abs(int8_final - exact_final)
    rng = exact_final.max() - exact_final.min()
    psnr = 20 * np.log10(rng / np.sqrt((err ** 2).mean()))
    print(f"exact : {exact_rate:.2f} steps/s")
    print(f"int8  : {int8_rate:.2f} steps/s  ({int8_rate / exact_rate:.2f}x)")
    print(f"latent deviation after {n2} steps: max {err.max():.4f}, "
          f"PSNR {psnr:.1f} dB (random weights)")


if __name__ == "__main__":
    main()
