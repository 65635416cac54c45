"""End-to-end 1024² StableDiffusionBrushNetPipeline run (BASELINE config #5).

The 50-step scan at 16384 latent tokens takes >30 min to XLA-compile through
the relay, so this uses the pipeline's dispatch="per_step" mode (one small
jitted step + jitted tiled decode) — the whole text-encode -> conditioning
assembly -> 50 UniPC steps -> tiled VAE decode path runs for real on one
chip.  SD-1.5-sized random-init weights (quality is not measured here; the
run pins wall-clock and memory viability).  Appends a row to results.csv.

Usage: python benchmarks/benchmark_pipeline_1024.py [--steps 50]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 quantized serving mode (enable_int8)")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "results.csv"))
    args = ap.parse_args()

    set_attention_backend("flash")  # mandatory at 16384 tokens
    dtype = jnp.bfloat16
    H = W = 1024

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

    pipe = StableDiffusionBrushNetPipeline(
        vae=(vae, vparams),
        text_encoder=(text, tparams),
        tokenizer=HashTokenizer(vocab_size=49408),
        unet=(unet, uparams),
        brushnet=(brushnet, bparams),
        depth_conditioning_mode="concat",
        dtype=dtype,
    )
    if args.int8:
        pipe.enable_int8()
    # No tiled decode: at 1024² bs=1 the full decoder fits 16 GB easily and
    # the plain decode is ~2x faster than 4 sequential overlapping tiles
    # (0.74 s -> ~0.3 s measured); enable_vae_tiling remains the tool for
    # batched/megapixel decodes that do not fit.

    rs = np.random.RandomState(0)
    image = rs.rand(H, W, 3).astype(np.float32)
    mask = np.zeros((H, W, 3), np.float32)
    mask[256:768, 256:768] = 1.0
    depth = rs.rand(H, W, 1).astype(np.float32)

    kwargs = dict(
        prompt="A perfect plane mirror reflection of a chair",
        image=image, mask=mask, depth=depth,
        height=H, width=W, num_inference_steps=args.steps,
        guidance_scale=7.5, seed=42, dispatch="per_step",
    )

    print("cold run (includes compiles)...", flush=True)
    t0 = time.time()
    out = pipe(**kwargs)
    cold = time.time() - t0
    assert out.shape == (1, H, W, 3), out.shape
    assert np.isfinite(out.astype(np.float32)).all()
    print(f"cold: {cold:.1f}s", flush=True)

    t0 = time.time()
    out = pipe(**kwargs)
    warm = time.time() - t0
    print(f"warm: {warm:.1f}s for {args.steps} steps end-to-end "
          f"({args.steps / warm:.2f} steps/s incl. relay + decode)", flush=True)

    name = "pipeline_1024_e2e_int8" if args.int8 else "pipeline_1024_e2e"
    with open(args.out, "a") as f:
        f.write(
            f"{name},1024,1,bf16,{round(args.steps / warm, 2)},"
            f"{round(1.0 / warm, 3)},full pipeline per_step dispatch; warm "
            f"{round(warm, 1)}s cold {round(cold, 1)}s; plain decode\n"
        )
    print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
