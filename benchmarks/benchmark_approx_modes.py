"""Throughput of the opt-in approximation modes at 512² (v5e, bf16, CFG 2).

Measures the same scanned denoise body the pipeline compiles for each mode:
  exact          — full dual branch every step
  deepcache N    — full step every N; shallow (cached deep trunk) in between
  encoder_reuse N— full step every N; cached-encoder decode in between
                   ("Faster Diffusion", arXiv 2312.09608)

Two-point chained timing over scan lengths (relay rules).  Appends rows to
results.csv with mode names in the notes column.

Usage: python benchmarks/benchmark_approx_modes.py [--int8]
"""

import argparse
import csv
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache

enable_default_compilation_cache()

from reflecting_reality_tpu.ops.attention import set_attention_backend
from reflecting_reality_tpu.ops.embeddings import precompute_time_embeddings
from reflecting_reality_tpu.schedulers.common import NoiseSchedule
from reflecting_reality_tpu.schedulers.unipc import UniPCSampler
from benchmark_mirrorfusion import build_models, denoise_inputs, timed


def make_denoise(unet, brushnet, steps, mode, interval, dtype, int8=False):
    schedule = NoiseSchedule.create(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear",
    )
    sampler = UniPCSampler(schedule, steps)
    timesteps = sampler.timesteps
    guidance = jnp.float32(7.5)

    def denoise(uparams, bparams, latents, cond, embeds):
        state0 = sampler.init_state(latents)
        temb_u = precompute_time_embeddings(unet, uparams, timesteps)
        temb_b = precompute_time_embeddings(brushnet, bparams, timesteps)

        def full(latents, t, i):
            latent_in = jnp.concatenate([latents, latents], axis=0).astype(dtype)
            # exact BrushNet CFG dedup (conv-only branch; see PROFILE.md)
            down, mid, up = brushnet.apply(
                bparams, latents.astype(dtype), t,
                embeds[:latents.shape[0]].astype(dtype),
                cond.astype(dtype), temb=temb_b[i],
            )
            down = [jnp.concatenate([d, d], 0) for d in down]
            mid = jnp.concatenate([mid, mid], 0)
            up = [jnp.concatenate([u, u], 0) for u in up]
            if mode == "deepcache":
                pred, deep = unet.apply(
                    uparams, latent_in, t, embeds.astype(dtype),
                    down_block_add_samples=down, mid_block_add_sample=mid,
                    up_block_add_samples=up, return_deep=True, temb=temb_u[i],
                )
                return pred, (deep, tuple(down), mid, tuple(up))
            if mode == "encoder_reuse":
                pred, enc = unet.apply(
                    uparams, latent_in, t, embeds.astype(dtype),
                    down_block_add_samples=down, mid_block_add_sample=mid,
                    up_block_add_samples=up, return_encoder=True, temb=temb_u[i],
                )
                return pred, (enc, mid, tuple(up))
            pred = unet.apply(
                uparams, latent_in, t, embeds.astype(dtype),
                down_block_add_samples=down, mid_block_add_sample=mid,
                up_block_add_samples=up, temb=temb_u[i],
            )
            return pred, None

        def cheap(latents, t, cache, i):
            latent_in = jnp.concatenate([latents, latents], axis=0).astype(dtype)
            if mode == "deepcache":
                deep, down, mid, up = cache
                pred, _ = unet.apply(
                    uparams, latent_in, t, embeds.astype(dtype),
                    down_block_add_samples=list(down), mid_block_add_sample=mid,
                    up_block_add_samples=list(up), cached_deep=deep, temb=temb_u[i],
                )
            else:
                enc, mid, up = cache
                pred, _ = unet.apply(
                    uparams, latent_in, t, embeds.astype(dtype),
                    mid_block_add_sample=mid, up_block_add_samples=list(up),
                    cached_encoder=enc, return_encoder=True, temb=temb_u[i],
                )
            return pred, cache

        cache0 = None
        if mode != "exact":
            shapes = jax.eval_shape(lambda lat: full(lat, timesteps[0], 0)[1], latents)
            cache0 = jax.tree_util.tree_map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype), shapes
            )

        def body(carry, xs):
            latents, state, cache = carry
            i, t = xs
            if mode == "exact":
                pred, cache = full(latents, t, i)
            else:
                pred, cache = jax.lax.cond(
                    i % interval == 0,
                    lambda lat, tt, c: full(lat, tt, i),
                    lambda lat, tt, c: cheap(lat, tt, c, i),
                    latents, t, cache,
                )
            uncond, text = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance * (text - uncond)
            latents, state = sampler.step(pred, i, latents, state)
            return (latents, state, cache), None

        (latents, _, _), _ = jax.lax.scan(
            body, (latents, state0, cache0), (jnp.arange(steps), timesteps)
        )
        return latents

    fn = jax.jit(denoise)
    if int8:
        # interception happens at trace time; keep every call in the context
        import functools

        import flax.linen as nn

        from reflecting_reality_tpu.ops.quant import int8_interceptor

        @functools.wraps(fn)
        def wrapped(*a):
            with nn.intercept_methods(int8_interceptor):
                return fn(*a)

        return wrapped
    return fn


def bench(unet, uparams, brushnet, bparams, mode, interval, dtype, n1=10, n2=50,
          int8=False):
    f1 = make_denoise(unet, brushnet, n1, mode, interval, dtype, int8)
    f2 = make_denoise(unet, brushnet, n2, mode, interval, dtype, int8)
    args = (uparams, bparams) + denoise_inputs(1, 64, dtype)
    t1, t2 = timed(f1, args), timed(f2, args)
    return 1.0 / ((t2 - t1) / (n2 - n1))


def latent_psnr(final, exact_final):
    err = np.abs(final - exact_final)
    rng = exact_final.max() - exact_final.min()
    return float(20 * np.log10(rng / np.sqrt((err ** 2).mean())))


def quality(unet, uparams, brushnet, bparams, dtype, steps=50, int8=False,
            exact_final=None):
    """Latent PSNR of each mode's full 50-step trajectory vs the exact bf16 one
    (same methodology as benchmark_int8_e2e.py; random SD-1.5-sized weights)."""
    args = denoise_inputs(1, 64, dtype)
    if exact_final is None:
        f = make_denoise(unet, brushnet, steps, "exact", 1, dtype, int8=False)
        exact_final = np.asarray(f(uparams, bparams, *args), np.float32)
    rows = []
    modes = [("encoder_reuse", 2), ("encoder_reuse", 3),
             ("deepcache", 2), ("deepcache", 3)]
    if int8:
        modes = [("exact", 1)] + modes
    for mode, interval in modes:
        f = make_denoise(unet, brushnet, steps, mode, interval, dtype, int8)
        final = np.asarray(f(uparams, bparams, *args), np.float32)
        label = mode if mode == "exact" else f"{mode}_{interval}"
        if int8:
            label += "_int8"
        rows.append((label, latent_psnr(final, exact_final)))
        print(f"{label}: {rows[-1][1]:.1f} dB latent PSNR vs exact", flush=True)
    return exact_final, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true",
                    help="measure the modes under W8A8 quantized serving")
    ap.add_argument("--quality", action="store_true",
                    help="report latent PSNR of each mode vs the exact "
                         "trajectory instead of throughput")
    args = ap.parse_args()

    out = os.path.join(os.path.dirname(__file__), "results.csv")
    set_attention_backend("flash")
    dtype = jnp.bfloat16
    unet, uparams, brushnet, bparams = build_models(dtype)

    if args.quality:
        exact_final, _ = quality(unet, uparams, brushnet, bparams, dtype,
                                 int8=False)
        if args.int8:
            from reflecting_reality_tpu.ops.quant import quantize_params

            qu, _ = quantize_params(uparams)
            qb, _ = quantize_params(bparams)
            quality(unet, qu, brushnet, qb, dtype, int8=True,
                    exact_final=exact_final)
        return

    if args.int8:
        from reflecting_reality_tpu.ops.quant import quantize_params

        uparams, nu = quantize_params(uparams)
        bparams, nb = quantize_params(bparams)
        print(f"quantized kernels: unet {nu}, brushnet {nb}", flush=True)

    rows = []
    for mode, interval in [("exact", 1), ("encoder_reuse", 2), ("encoder_reuse", 3),
                           ("deepcache", 2), ("deepcache", 3)]:
        sps = bench(unet, uparams, brushnet, bparams, mode, interval, dtype,
                    int8=args.int8)
        label = mode if mode == "exact" else f"{mode}_{interval}"
        suffix = "_int8" if args.int8 else ""
        rows.append(["denoise_512_" + label + suffix, 512, 1, "bf16", round(sps, 2),
                     round(sps / 50, 3),
                     f"{mode} interval={interval}" + (" W8A8 int8" if args.int8 else "")])
        print(rows[-1], flush=True)

    with open(out, "a", newline="") as f:
        csv.writer(f).writerows(rows)


if __name__ == "__main__":
    main()
