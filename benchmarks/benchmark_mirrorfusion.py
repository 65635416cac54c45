"""Benchmark harness (reference: MirrorFusion/benchmarks/benchmark_sd_inpainting.py
+ benchmarks/utils.py:52 — latency/memory rows appended to a CSV).

Measures the BASELINE.md tracked configs on the current device:
  1. 512², 50-step denoise loop, CFG bs=1 image (the headline metric)
  2. batched CFG inference bs=8, bf16, 512²
  3. 1024² denoise step + tiled VAE decode (flash attention mandatory)

Relay-aware timing: jitted chained loops at two iteration counts, difference
divided (see .claude/skills/verify/SKILL.md).  Rows:
    benchmark,resolution,batch,dtype,steps_per_sec,images_per_sec,notes

Usage: python benchmarks/benchmark_mirrorfusion.py [--out benchmarks/results.csv]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache

enable_default_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from reflecting_reality_tpu.models.brushnet import BrushNetModel
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL
from reflecting_reality_tpu.ops.attention import set_attention_backend
from reflecting_reality_tpu.parallel.sharded_vae import tiled_decode
from reflecting_reality_tpu.schedulers.common import NoiseSchedule
from reflecting_reality_tpu.schedulers.unipc import UniPCSampler


def timed(fn, args, reps=3):
    r = fn(*args)
    jax.tree_util.tree_map(np.asarray, r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        r = fn(*args)
        jax.tree_util.tree_map(np.asarray, r)
        best = min(best, time.time() - t0)
    return best


def build_models(dtype):
    unet = UNet2DConditionModel(dtype=dtype)
    brushnet = BrushNetModel(conditioning_channels=6, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 64, 64, 4), dtype)
    t = jnp.zeros((1,), jnp.int32)
    ehs = jnp.zeros((1, 77, 768), dtype)
    cond = jnp.zeros((1, 64, 64, 6), dtype)
    uparams = jax.jit(unet.init)(rng, sample, t, ehs)
    bparams = jax.jit(brushnet.init)(jax.random.PRNGKey(1), sample, t, ehs, cond)
    # bf16 weights — same policy as bench.py (halves param HBM traffic)
    from reflecting_reality_tpu.core.io import cast_floating

    uparams = cast_floating(uparams, dtype)
    bparams = cast_floating(bparams, dtype)
    return unet, uparams, brushnet, bparams


def make_denoise(unet, brushnet, steps, batch, latent, dtype):
    schedule = NoiseSchedule.create(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear",
    )
    sampler = UniPCSampler(schedule, steps)
    timesteps = sampler.timesteps
    guidance = jnp.float32(7.5)

    def denoise(uparams, bparams, latents, cond, embeds):
        state0 = sampler.init_state(latents)

        def body(carry, xs):
            latents, state = carry
            i, t = xs
            latent_in = jnp.concatenate([latents, latents], axis=0)
            # exact BrushNet CFG dedup (conv-only branch; see PROFILE.md)
            down, mid, up = brushnet.apply(
                bparams, latents.astype(dtype), t,
                embeds[:latents.shape[0]].astype(dtype), cond.astype(dtype),
            )
            down = [jnp.concatenate([d, d], 0) for d in down]
            mid = jnp.concatenate([mid, mid], 0)
            up = [jnp.concatenate([u, u], 0) for u in up]
            pred = unet.apply(
                uparams, latent_in.astype(dtype), t, embeds.astype(dtype),
                down_block_add_samples=down, mid_block_add_sample=mid,
                up_block_add_samples=up,
            )
            uncond, text = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance * (text - uncond)
            latents, state = sampler.step(pred, i, latents, state)
            return (latents, state), None

        (latents, _), _ = jax.lax.scan(
            body, (latents, state0), (jnp.arange(steps), timesteps)
        )
        return latents

    return jax.jit(denoise)


def denoise_inputs(batch, latent, dtype):
    latents = jax.random.normal(jax.random.PRNGKey(2), (batch, latent, latent, 4), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(3), (batch, latent, latent, 6), jnp.float32)
    embeds = jax.random.normal(jax.random.PRNGKey(4), (2 * batch, 77, 768), jnp.float32)
    return latents, cond, embeds


def bench_denoise_dispatch(unet, uparams, brushnet, bparams, batch, latent,
                           dtype, n1=5, n2=25):
    """Single-step jit, async-dispatched n times, one device sync at the end;
    two-point difference removes the relay overhead."""
    guidance = jnp.float32(7.5)

    def step(uparams, bparams, latents, cond, embeds):
        latent_in = jnp.concatenate([latents, latents], 0)
        # exact BrushNet CFG dedup (conv-only branch; see PROFILE.md)
        down, mid, up = brushnet.apply(
            bparams, latents.astype(dtype), jnp.zeros((batch,), jnp.int32),
            embeds[:batch].astype(dtype), cond.astype(dtype),
        )
        down = [jnp.concatenate([d, d], 0) for d in down]
        mid = jnp.concatenate([mid, mid], 0)
        up = [jnp.concatenate([u, u], 0) for u in up]
        pred = unet.apply(
            uparams, latent_in.astype(dtype), jnp.zeros((2 * batch,), jnp.int32),
            embeds.astype(dtype), down_block_add_samples=down,
            mid_block_add_sample=mid, up_block_add_samples=up,
        )
        u, c = jnp.split(pred, 2, 0)
        return u + guidance * (c - u)

    f = jax.jit(step)
    latents, cond, embeds = denoise_inputs(batch, latent, dtype)

    def run(n):
        r = latents
        for _ in range(n):
            r = f(uparams, bparams, r, cond, embeds)
        np.asarray(r)

    run(2)  # compile
    import time as _t

    best = {}
    for n in (n1, n2):
        b = float("inf")
        for _ in range(3):
            t0 = _t.time()
            run(n)
            b = min(b, _t.time() - t0)
        best[n] = b
    return (n2 - n1) / (best[n2] - best[n1])


def bench_denoise(unet, uparams, brushnet, bparams, batch, latent, dtype,
                  n1=10, n2=50):
    f1 = make_denoise(unet, brushnet, n1, batch, latent, dtype)
    f2 = make_denoise(unet, brushnet, n2, batch, latent, dtype)
    args = (uparams, bparams) + denoise_inputs(batch, latent, dtype)
    t1, t2 = timed(f1, args), timed(f2, args)
    per_step = (t2 - t1) / (n2 - n1)
    return 1.0 / per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "results.csv"))
    ap.add_argument("--skip_1024", action="store_true")
    args = ap.parse_args()

    set_attention_backend("flash")
    dtype = jnp.bfloat16
    unet, uparams, brushnet, bparams = build_models(dtype)

    rows = []

    sps = bench_denoise(unet, uparams, brushnet, bparams, 1, 64, dtype)
    rows.append(["denoise_512", 512, 1, "bf16", round(sps, 2),
                 round(sps / 50, 3), "headline; CFG batch 2; 50-step basis"])

    sps8 = bench_denoise(unet, uparams, brushnet, bparams, 8, 64, dtype)
    rows.append(["denoise_512_bs8", 512, 8, "bf16", round(sps8, 2),
                 round(8 * sps8 / 50, 3), "batched CFG (16 through models)"])

    if not args.skip_1024:
        # scan-of-50 at 1024² takes >30 min to compile through the remote
        # tunnel; measure via pipelined single-step dispatches instead.
        sps_hr = bench_denoise_dispatch(unet, uparams, brushnet, bparams,
                                        1, 128, dtype)
        # tiled VAE decode at 1024²
        vae = AutoencoderKL(dtype=dtype)
        vparams = jax.jit(vae.init)(
            jax.random.PRNGKey(5), jnp.zeros((1, 256, 256, 3), dtype), jax.random.PRNGKey(6)
        )
        z = jax.random.normal(jax.random.PRNGKey(7), (1, 128, 128, 4), dtype)
        dec = jax.jit(lambda p, z: tiled_decode(vae, p, z, num_tiles=4, overlap=8))
        t_dec = timed(dec, (vparams, z))
        rows.append(["denoise_1024", 1024, 1, "bf16", round(sps_hr, 2),
                     round(sps_hr / 50, 3),
                     f"flash attn @16384 tokens; tiled decode {t_dec:.2f}s incl. relay"])

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    new = not os.path.exists(args.out)
    with open(args.out, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(["benchmark", "resolution", "batch", "dtype",
                        "steps_per_sec", "images_per_sec", "notes"])
        w.writerows(rows)
    for r in rows:
        print(",".join(str(x) for x in r))


if __name__ == "__main__":
    main()
