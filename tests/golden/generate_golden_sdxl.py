"""Generate a golden end-to-end SDXL BrushNet pipeline trajectory from the
reference StableDiffusionXLBrushNetPipeline (torch, CPU, tiny components).

Pins the SDXL-specific orchestration on top of what the SD-1.5 golden
already covers: dual text encoders (penultimate hidden states concat +
projected pooled output), force_zeros_for_empty_prompt negatives, text_time
micro-conditioning (add_time_ids + add_embedding) through BOTH the unet and
the brushnet, CFG 5.0 default, and the 0.13025-style scaling factor path
(tiny vae keeps its own config value).

Run once: python tests/golden/generate_golden_sdxl.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/reference/MirrorFusion/src")

import torch  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "sdxl_pipeline.npz")

TINY_XL = dict(
    block_out_channels=(8, 16, 16, 16),
    attention_head_dim=2,
    cross_attention_dim=48,           # text1 hidden 32 + text2 hidden 16
    norm_num_groups=4,
    layers_per_block=2,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=6 * 8 + 16,  # time_ids + pooled
)
H = W = 64
STEPS = 4
CFG = 5.0


def make_tokenizer(vocab_size=1000):
    import json

    from transformers import CLIPTokenizer

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tests.tiny_checkpoint import write_char_tokenizer

    tok_dir = tempfile.mkdtemp()
    write_char_tokenizer(tok_dir)
    with open(os.path.join(tok_dir, "vocab.json")) as f:
        vocab = json.load(f)
    small = {k: v for k, v in vocab.items() if v < vocab_size - 2}
    small["<|startoftext|>"] = vocab_size - 2
    small["<|endoftext|>"] = vocab_size - 1
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(small, f)
    tok = CLIPTokenizer(
        vocab_file=os.path.join(tok_dir, "vocab.json"),
        merges_file=os.path.join(tok_dir, "merges.txt"),
        bos_token="<|startoftext|>", eos_token="<|endoftext|>",
        pad_token="<|endoftext|>",
    )
    tok.model_max_length = 77
    return tok


@torch.no_grad()
def main():
    from diffusers import AutoencoderKL, BrushNetModel, UNet2DConditionModel
    from diffusers import UniPCMultistepScheduler
    from diffusers.models.autoencoders.vae import DiagonalGaussianDistribution

    DiagonalGaussianDistribution.sample = lambda self, generator=None: self.mode()
    from diffusers.pipelines.brushnet.pipeline_brushnet_sd_xl import (
        StableDiffusionXLBrushNetPipeline,
    )
    from transformers import (
        CLIPTextConfig,
        CLIPTextModel,
        CLIPTextModelWithProjection,
    )

    torch.manual_seed(0)
    unet = UNet2DConditionModel(sample_size=8, **TINY_XL)
    brushnet = BrushNetModel.from_unet(unet, conditioning_channels=5)
    for name, p in brushnet.named_parameters():
        if "brushnet_" in name:
            p.copy_(torch.randn_like(p) * 0.05)

    vae = AutoencoderKL(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 8, 8, 8), norm_num_groups=4, layers_per_block=1,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
    )

    cfg1 = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=77, bos_token_id=998, eos_token_id=999,
    )
    cfg2 = CLIPTextConfig(
        vocab_size=1000, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, projection_dim=16,
        max_position_embeddings=77, bos_token_id=998, eos_token_id=999,
    )
    text = CLIPTextModel(cfg1)
    text2 = CLIPTextModelWithProjection(cfg2)
    tokenizer = make_tokenizer()
    tokenizer_2 = make_tokenizer()

    scheduler = UniPCMultistepScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear",
    )
    pipe = StableDiffusionXLBrushNetPipeline(
        vae=vae, text_encoder=text, text_encoder_2=text2,
        tokenizer=tokenizer, tokenizer_2=tokenizer_2,
        unet=unet, brushnet=brushnet, scheduler=scheduler,
    )
    pipe.set_progress_bar_config(disable=True)

    rng = np.random.RandomState(0)
    image = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    mask = np.zeros((H, W, 3), np.uint8)
    mask[16:48, 16:48] = 255
    latents = rng.randn(1, 4, H // 8, W // 8).astype(np.float32)

    from PIL import Image

    prompt = "a mirror"
    out = pipe(
        prompt,
        image=Image.fromarray(image),
        mask=Image.fromarray(mask),
        num_inference_steps=STEPS,
        guidance_scale=CFG,
        latents=torch.tensor(latents),
        generator=torch.Generator().manual_seed(123),
        output_type="np",
    ).images[0]

    state = {f"unet::{k}": v.numpy() for k, v in unet.state_dict().items()}
    state.update({f"brushnet::{k}": v.numpy() for k, v in brushnet.state_dict().items()})
    state.update({f"vae::{k}": v.numpy() for k, v in vae.state_dict().items()})
    state.update({f"text::{k}": v.numpy() for k, v in text.state_dict().items()})
    state.update({f"text2::{k}": v.numpy() for k, v in text2.state_dict().items()})

    tok = lambda t: np.asarray(
        tokenizer(t, max_length=77, padding="max_length", truncation=True)["input_ids"],
        np.int32,
    )
    np.savez_compressed(
        OUT,
        image=image, mask=mask, latents=latents,
        prompt_ids=tok(prompt), uncond_ids=tok(""),
        final_image=out,
        steps=np.int32(STEPS), cfg=np.float32(CFG),
        vae_scaling=np.float32(vae.config.scaling_factor),
        **state,
    )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
