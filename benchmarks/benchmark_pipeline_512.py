"""End-to-end 512² eval-protocol run: ONE test sample = 4 seeds in one
batched pipeline call (the reference protocol, test_brushnet.py:248-259,
as run by cli/test.py --batch_seeds), 50 UniPC steps, CFG 7.5, full
pipeline: host preprocess -> conditioning assembly -> jitted scan ->
decode -> device-side uint8 -> fetch.

This is the wall-clock that divides the SynMirror test-split sweep.
Appends a row to results.csv.

Usage: python benchmarks/benchmark_pipeline_512.py [--steps 50]
"""

import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache

enable_default_compilation_cache()

from reflecting_reality_tpu.data.tokenizer import HashTokenizer
from reflecting_reality_tpu.models.brushnet import BrushNetModel
from reflecting_reality_tpu.models.clip_text import CLIPTextModel
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL
from reflecting_reality_tpu.ops.attention import set_attention_backend
from reflecting_reality_tpu.pipelines.brushnet_pipeline import StableDiffusionBrushNetPipeline


def build_pipe(dtype=jnp.bfloat16):
    """SD-1.5-sized pipeline on random weights (flash attention, depth
    concat), shared by the 512 protocol/sweep and serving benchmarks."""
    set_attention_backend("flash")
    unet = UNet2DConditionModel(dtype=dtype)
    brushnet = BrushNetModel(conditioning_channels=6, dtype=dtype)
    vae = AutoencoderKL(dtype=dtype)
    text = CLIPTextModel(dtype=dtype)

    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 64, 64, 4), dtype)
    t0s = jnp.zeros((1,), jnp.int32)
    ehs = jnp.zeros((1, 77, 768), dtype)
    print("init models...", flush=True)
    uparams = jax.jit(unet.init)(rng, sample, t0s, ehs)
    bparams = jax.jit(brushnet.init)(
        jax.random.PRNGKey(1), sample, t0s, ehs, jnp.zeros((1, 64, 64, 6), dtype)
    )
    vparams = jax.jit(vae.init)(
        jax.random.PRNGKey(2), jnp.zeros((1, 256, 256, 3), dtype), jax.random.PRNGKey(9)
    )
    tparams = jax.jit(text.init)(jax.random.PRNGKey(3), jnp.zeros((1, 77), jnp.int32))

    return StableDiffusionBrushNetPipeline(
        vae=(vae, vparams),
        text_encoder=(text, tparams),
        tokenizer=HashTokenizer(vocab_size=49408),
        unet=(unet, uparams),
        brushnet=(brushnet, bparams),
        depth_conditioning_mode="concat",
        dtype=dtype,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 quantized serving (approximation mode)")
    ap.add_argument("--sweep", type=int, default=0, metavar="N",
                    help="measure an N-distinct-sample sweep, blocking loop "
                         "vs the CLI's one-deep overlapped loop "
                         "(output_type='device')")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "results.csv"))
    args = ap.parse_args()

    dtype = jnp.bfloat16
    H = W = 512
    pipe = build_pipe(dtype)
    pipe.cast_params()  # bf16 weights, the production inference policy
    if args.int8:
        pipe.enable_int8()

    rs = np.random.RandomState(0)
    image = rs.rand(H, W, 3).astype(np.float32)
    mask = np.zeros((H, W, 3), np.float32)
    mask[128:384, 128:384] = 1.0
    depth = rs.rand(H, W, 1).astype(np.float32)

    kwargs = dict(
        prompt="A perfect plane mirror reflection of a chair",
        image=image, mask=mask, depth=depth,
        height=H, width=W, num_inference_steps=args.steps,
        guidance_scale=7.5, seed=42,
        num_images_per_prompt=args.seeds,
    )

    print("cold run (includes compiles)...", flush=True)
    t0 = time.time()
    out = pipe(**kwargs)
    cold = time.time() - t0
    assert out.shape == (args.seeds, H, W, 3), out.shape
    print(f"cold: {cold:.1f}s", flush=True)

    if args.sweep:
        def sample_kwargs(i):
            # distinct per-sample host prep, as in the real test sweep
            r = np.random.RandomState(100 + i)
            kw = dict(kwargs)
            kw.update(
                image=r.rand(H, W, 3).astype(np.float32),
                depth=r.rand(H, W, 1).astype(np.float32),
                prompt=f"A perfect plane mirror reflection of object {i}",
            )
            return kw

        def run_blocking():
            t0 = time.time()
            for i in range(args.sweep):
                out = pipe(**sample_kwargs(i), output_type="pil")
                assert len(out) == args.seeds
            return (time.time() - t0) / args.sweep

        def run_overlapped():
            t0 = time.time()
            pending = None
            for i in range(args.sweep):
                h = pipe(**sample_kwargs(i), output_type="device")
                if pending is not None:
                    pipe.image_processor.postprocess(
                        np.asarray(pending), output_type="pil"
                    )
                pending = h
            out = pipe.image_processor.postprocess(
                np.asarray(pending), output_type="pil"
            )
            assert len(out) == args.seeds
            return (time.time() - t0) / args.sweep

        blocking = min(run_blocking(), run_blocking())
        overlapped = min(run_overlapped(), run_overlapped())
        tag = "_int8" if args.int8 else ""
        print(f"sweep ({args.sweep} samples): blocking {blocking:.2f}s/sample, "
              f"overlapped {overlapped:.2f}s/sample "
              f"({blocking / overlapped:.3f}x)", flush=True)
        with open(args.out, "a") as f:
            f.write(
                f"pipeline_512_sweep_overlap{tag},512,{args.seeds},bf16,"
                f"{round(args.steps / overlapped, 2)},"
                f"{round(args.seeds / overlapped, 3)},"
                f"one-deep overlapped sweep{' W8A8 int8' if args.int8 else ''}: "
                f"{round(overlapped, 2)}s/sample vs {round(blocking, 2)} blocking "
                f"({round(blocking / overlapped, 3)}x) over {args.sweep} samples\n"
            )
        print(f"appended to {args.out}")
        return

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = pipe(**kwargs)
        best = min(best, time.time() - t0)
    samples_per_s = 1.0 / best       # one test SAMPLE = all seeds
    print(f"warm: {best:.2f}s per test sample ({args.seeds} seeds batched, "
          f"{args.steps} steps; {args.seeds / best:.2f} images/s e2e)", flush=True)

    with open(args.out, "a") as f:
        tag = "_int8" if args.int8 else ""
        f.write(
            f"pipeline_512_e2e_protocol{tag},512,{args.seeds},bf16,"
            f"{round(args.steps / best, 2)},{round(args.seeds / best, 3)},"
            f"eval protocol e2e{' W8A8 int8' if args.int8 else ''}: "
            f"{args.seeds} batched seeds {args.steps} steps; "
            f"warm {round(best, 2)}s/sample cold {round(cold, 1)}s; "
            f"{round(samples_per_s, 3)} samples/s\n"
        )
    print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
