"""Generate a golden end-to-end pipeline trajectory from the reference
StableDiffusionBrushNetPipeline (torch, CPU, tiny components).

Pins the FULL inference orchestration: prompt encode + CFG layout, image /
mask / depth preprocessing (incl. the channel-sum mask trick), conditioning
latent assembly, UniPC stepping, brushnet residual injection, and VAE
decode.  Randomness is removed by (a) deterministic VAE encode: latent
moments are produced by the model, and torch sampling is pinned with a
manual-seeded generator whose noise we also store, and (b) a stored initial
latent.

tests/test_golden_pipeline.py replays the same weights + inputs through our
pipeline internals and compares the trajectory.

Run once: python tests/golden/generate_golden_pipeline.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference/MirrorFusion/src")

import torch  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "pipeline.npz")

TINY = dict(
    block_out_channels=(8, 16, 16, 16),
    attention_head_dim=2,
    cross_attention_dim=32,
    norm_num_groups=4,
    layers_per_block=2,
)
H = W = 64
STEPS = 4
CFG = 7.5


@torch.no_grad()
def main():
    from diffusers import AutoencoderKL, BrushNetModel, UNet2DConditionModel
    from diffusers import UniPCMultistepScheduler
    from diffusers.models.autoencoders.vae import DiagonalGaussianDistribution

    # Deterministic VAE encode: torch and jax RNGs can't match, so pin
    # sampling to the distribution mode on both sides.
    DiagonalGaussianDistribution.sample = lambda self, generator=None: self.mode()
    from diffusers.pipelines.brushnet.pipeline_brushnet import (
        StableDiffusionBrushNetPipeline,
    )
    from transformers import CLIPTextConfig, CLIPTextModel, CLIPTokenizer

    torch.manual_seed(0)
    unet = UNet2DConditionModel(sample_size=8, **TINY)
    brushnet = BrushNetModel.from_unet(unet, conditioning_channels=6)
    for name, p in brushnet.named_parameters():
        if "brushnet_" in name:
            p.copy_(torch.randn_like(p) * 0.05)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 8, 8, 8), norm_num_groups=4, layers_per_block=1,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
    )
    text_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=77, bos_token_id=0, eos_token_id=2,
    )
    text = CLIPTextModel(text_cfg)

    # build a char-level tokenizer over our own tiny vocab files
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tests.tiny_checkpoint import write_char_tokenizer
    import tempfile

    tok_dir = tempfile.mkdtemp()
    write_char_tokenizer(tok_dir)
    # shrink ids into the tiny vocab: remap via modulo is NOT faithful; instead
    # use a vocab that fits: regenerate with ids < 1000 by truncating the file.
    import json

    with open(os.path.join(tok_dir, "vocab.json")) as f:
        vocab = json.load(f)
    small = {k: v for k, v in vocab.items() if v < 998}
    small["<|startoftext|>"] = 998
    small["<|endoftext|>"] = 999
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(small, f)
    tokenizer = CLIPTokenizer(
        vocab_file=os.path.join(tok_dir, "vocab.json"),
        merges_file=os.path.join(tok_dir, "merges.txt"),
        bos_token="<|startoftext|>", eos_token="<|endoftext|>",
        pad_token="<|endoftext|>",
    )
    tokenizer.model_max_length = 77

    scheduler = UniPCMultistepScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear",
    )
    pipe = StableDiffusionBrushNetPipeline(
        vae=vae, text_encoder=text, tokenizer=tokenizer, unet=unet,
        brushnet=brushnet, scheduler=scheduler, safety_checker=None,
        feature_extractor=None, requires_safety_checker=False,
        depth_conditioning_mode="concat",
    )
    pipe.set_progress_bar_config(disable=True)

    rng = np.random.RandomState(0)
    image = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    mask = np.zeros((H, W, 3), np.uint8)
    mask[16:48, 16:48] = 255
    depth = (rng.rand(H, W) * 2 - 1).astype(np.float32)

    from PIL import Image

    prompt = "a mirror"
    # fixed initial latents + deterministic generator for the vae sampling
    latents = rng.randn(1, 4, H // 8, W // 8).astype(np.float32)
    generator = torch.Generator().manual_seed(123)

    out = pipe(
        prompt,
        Image.fromarray(image),
        Image.fromarray(mask),
        depth=torch.tensor(depth)[None, None],
        num_inference_steps=STEPS,
        guidance_scale=CFG,
        latents=torch.tensor(latents),
        generator=generator,
        output_type="np",
    ).images[0]

    # ALSO record the deterministic ingredients we must replicate:
    # conditioning latents built with the same generator stream are
    # irreproducible across frameworks, so store the pipeline's own
    # intermediate: re-run the assembly with mode() instead of sample() for a
    # separate deterministic target.
    img_t = pipe.image_processor.preprocess(
        Image.fromarray(image), height=H, width=W
    ).float()
    m_t = pipe.image_processor.preprocess(
        Image.fromarray(mask), height=H, width=W
    ).float()
    m1 = (m_t.sum(1, keepdim=True) < 0).float()
    cond_mode = vae.encode(img_t).latent_dist.mode() * vae.config.scaling_factor
    m_lat = torch.nn.functional.interpolate(m1, size=cond_mode.shape[-2:])
    d_lat = torch.nn.functional.interpolate(
        torch.tensor(depth)[None, None], size=cond_mode.shape[-2:]
    )
    cond_full = torch.cat([cond_mode, m_lat, d_lat], dim=1)

    state = {f"unet::{k}": v.numpy() for k, v in unet.state_dict().items()}
    state.update({f"brushnet::{k}": v.numpy() for k, v in brushnet.state_dict().items()})
    state.update({f"vae::{k}": v.numpy() for k, v in vae.state_dict().items()})
    state.update({f"text::{k}": v.numpy() for k, v in text.state_dict().items()})

    np.savez_compressed(
        OUT,
        image=image, mask=mask, depth=depth, latents=latents,
        prompt_ids=np.asarray(
            tokenizer(prompt, max_length=77, padding="max_length",
                      truncation=True)["input_ids"], np.int32),
        uncond_ids=np.asarray(
            tokenizer("", max_length=77, padding="max_length",
                      truncation=True)["input_ids"], np.int32),
        cond_latents_mode=cond_full.numpy(),
        final_image=out,
        steps=np.int32(STEPS), cfg=np.float32(CFG),
        **state,
    )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
