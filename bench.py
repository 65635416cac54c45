"""Headline benchmark: MirrorFusion 512x512 denoise throughput on one TPU chip.

Measures the inference hot loop of BASELINE.md config — batch-2 CFG over
(BrushNet conv-twin forward + SD-1.5 UNet forward with 28 injected residuals
+ CFG combine + UniPC step) at 512x512 (64x64 latents), bf16 compute — i.e.
one full denoise step of `StableDiffusionBrushNetPipeline` (reference hot
loop: pipeline_brushnet.py:1249-1332, 2 UNet-sized forwards per step).

Baseline: diffusers on A100 runs plain SD-1.5 at ~23 UNet-it/s (fp16, 512²,
CFG batch); the BrushNet dual-branch step costs ~2 UNet forwards, so the
A100 reference rate is ~11.5 denoise steps/s.  vs_baseline = ours / 11.5.

Timing notes: this environment reaches the chip through a relay with ~1-2 s
fixed latency per dispatch, and block_until_ready() under-waits; we therefore
time two jitted programs with different scan lengths and report the
difference (see .claude/skills/verify/SKILL.md).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache
from reflecting_reality_tpu.ops.attention import set_attention_backend

enable_default_compilation_cache()
from reflecting_reality_tpu.models.brushnet import BrushNetModel
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.schedulers.unipc import UniPCSampler
from reflecting_reality_tpu.schedulers.common import NoiseSchedule

A100_BASELINE_STEPS_PER_S = 11.5


def build(dtype=jnp.bfloat16):
    unet = UNet2DConditionModel(dtype=dtype)          # SD-1.5 config defaults
    brushnet = BrushNetModel(conditioning_channels=6, dtype=dtype)  # depth concat mode
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 64, 64, 4), dtype)
    t = jnp.zeros((1,), jnp.int32)
    ehs = jnp.zeros((1, 77, 768), dtype)
    cond = jnp.zeros((1, 64, 64, 6), dtype)
    with jax.default_device(jax.devices()[0]):
        uparams = jax.jit(unet.init)(rng, sample, t, ehs)
        bparams = jax.jit(brushnet.init)(jax.random.PRNGKey(1), sample, t, ehs, cond)
    # bf16 weights (the reference's torch_dtype=fp16 inference policy):
    # halves the per-step param HBM traffic — measured 33.9 -> 35.0 steps/s.
    from reflecting_reality_tpu.core.io import cast_floating

    uparams = cast_floating(uparams, dtype)
    bparams = cast_floating(bparams, dtype)
    return unet, uparams, brushnet, bparams


def make_denoise(unet, brushnet, steps, batch=1, dtype=jnp.bfloat16):
    schedule = NoiseSchedule.create(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear",
    )
    sampler = UniPCSampler(schedule, steps)
    timesteps = sampler.timesteps
    guidance = jnp.float32(7.5)

    def denoise(uparams, bparams, latents, cond, embeds):
        state0 = sampler.init_state(latents)
        # fused time-embedding GEMMs: batch the timestep MLPs over all steps
        # once, outside the scan (same as the pipeline's sampler fn)
        from reflecting_reality_tpu.ops.embeddings import precompute_time_embeddings

        temb_u = precompute_time_embeddings(unet, uparams, timesteps)
        temb_b = precompute_time_embeddings(brushnet, bparams, timesteps)

        def body(carry, xs):
            latents, state = carry
            i, t = xs
            latent_in = jnp.concatenate([latents, latents], axis=0)
            # conv-only BrushNet: both CFG halves see identical inputs, so
            # run it once at half batch and tile the residuals (exact; same
            # as the pipeline's dedup_brushnet path, golden-pinned).
            down, mid, up = brushnet.apply(
                bparams, latents.astype(dtype), t,
                embeds[:latents.shape[0]].astype(dtype),
                cond.astype(dtype),
                temb=temb_b[i],
            )
            down = [jnp.concatenate([d, d], axis=0) for d in down]
            mid = jnp.concatenate([mid, mid], axis=0)
            up = [jnp.concatenate([u, u], axis=0) for u in up]
            pred = unet.apply(
                uparams, latent_in.astype(dtype), t, embeds.astype(dtype),
                down_block_add_samples=down, mid_block_add_sample=mid,
                up_block_add_samples=up, temb=temb_u[i],
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


def timed(fn, args, reps=3):
    """Warm, then return the per-rep wall times (list of len reps)."""
    r = fn(*args)
    np.asarray(r)  # sync through the relay
    times = []
    for _ in range(reps):
        t0 = time.time()
        r = fn(*args)
        np.asarray(r)
        times.append(time.time() - t0)
    return times


def measure(unet, uparams, brushnet, bparams, batch, dtype, steps_pair=(10, 50)):
    """Two-point chained denoise timing at a given image batch; returns the
    three per-rep steps/s estimates."""
    latents = jax.random.normal(jax.random.PRNGKey(2), (batch, 64, 64, 4), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(3), (batch, 64, 64, 6), jnp.float32)
    embeds = jax.random.normal(jax.random.PRNGKey(4), (2 * batch, 77, 768), jnp.float32)
    n1, n2 = steps_pair
    f1 = make_denoise(unet, brushnet, n1, batch, dtype)
    f2 = make_denoise(unet, brushnet, n2, batch, dtype)
    # Variance discipline: three independent two-point estimates, pairing the
    # i-th rep of each program, so round-over-round deltas can be judged
    # against the measured spread instead of single-shot jitter.
    t1s = timed(f1, (uparams, bparams, latents, cond, embeds))
    t2s = timed(f2, (uparams, bparams, latents, cond, embeds))
    return [1.0 / ((b - a) / (n2 - n1)) for a, b in zip(t1s, t2s)]


def measure_protocol_e2e(steps=50, seeds=4, n_samples=6, reps=2):
    """TRUE end-to-end eval-protocol rate (VERDICT r4 item 5): full pipeline
    calls — host preprocess, packed upload, text encode, conditioning
    assembly, 50-step denoise scan, VAE decode, device uint8, fetch,
    postprocess — over distinct samples with the CLI's one-deep overlapped
    drive (output_type="device"), 4 batched seeds per sample (the reference
    protocol, test_brushnet.py:248-259).  Returns images/s/chip."""
    from benchmarks.benchmark_pipeline_512 import build_pipe

    pipe = build_pipe(jnp.bfloat16)
    pipe.cast_params()
    H = W = 512

    def sample_kwargs(i):
        r = np.random.RandomState(100 + i)
        mask = np.zeros((H, W, 3), np.float32)
        mask[128:384, 128:384] = 1.0
        return dict(
            prompt=f"A perfect plane mirror reflection of object {i}",
            image=r.rand(H, W, 3).astype(np.float32), mask=mask,
            depth=r.rand(H, W, 1).astype(np.float32),
            height=H, width=W, num_inference_steps=steps,
            guidance_scale=7.5, seed=42, num_images_per_prompt=seeds,
        )

    pipe(**sample_kwargs(0))  # warm: compiles ride the persistent cache
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        pending = None
        for i in range(n_samples):
            h = pipe(**sample_kwargs(i), output_type="device")
            if pending is not None:
                pipe.image_processor.postprocess(
                    np.asarray(pending), output_type="pil")
            pending = h
        out = pipe.image_processor.postprocess(
            np.asarray(pending), output_type="pil")
        assert len(out) == seeds
        best = min(best, (time.time() - t0) / n_samples)
    return seeds / best, best


def main():
    # Pallas flash attention: 33.6 steps/s vs 16.0 with the einsum path
    # (measured on v5e; the 4096-token self-attention dominates).
    set_attention_backend("flash")
    dtype = jnp.bfloat16
    unet, uparams, brushnet, bparams = build(dtype)

    ests = measure(unet, uparams, brushnet, bparams, 1, dtype)
    steps_per_s = max(ests)  # min-of-3 time == best steps/s
    spread = (max(ests) - min(ests)) / min(ests)

    # kernel-basis bs=4 rate, kept for round-over-round continuity with
    # BENCH_r04's protocol_steps_per_sec_bs4
    ests4 = measure(unet, uparams, brushnet, bparams, 4, dtype)

    # the tracked protocol metric is END-TO-END (not kernel-derived)
    protocol_img_per_s, per_sample_s = measure_protocol_e2e()

    print(json.dumps({
        "metric": "mirrorfusion_512_denoise_steps_per_sec_per_chip",
        "value": round(steps_per_s, 3),
        "unit": "steps/s (CFG batch, bs=1 image)",
        "vs_baseline": round(steps_per_s / A100_BASELINE_STEPS_PER_S, 3),
        "runs": [round(e, 3) for e in ests],
        "spread_frac": round(spread, 4),
        "protocol_metric": "mirrorfusion_512_protocol_e2e_images_per_sec_per_chip",
        "protocol_value": round(protocol_img_per_s, 4),
        "protocol_unit": "images/s e2e (4 seeds/sample, 50 UniPC steps, "
                         "overlapped sweep incl. host+encode+decode+fetch)",
        "protocol_s_per_sample": round(per_sample_s, 3),
        "kernel_steps_per_sec_bs4": round(max(ests4), 3),
    }))


if __name__ == "__main__":
    main()
