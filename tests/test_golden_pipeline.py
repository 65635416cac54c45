"""End-to-end pipeline golden parity: the reference
StableDiffusionBrushNetPipeline (torch, 4 UniPC steps, CFG 7.5, depth
concat) and our jitted pipeline must produce the same image from the same
weights, inputs, and initial latents (VAE encode pinned to the mode on both
sides — torch/jax RNG streams can't match)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from reflecting_reality_tpu.core.io import torch_to_flax_params
from reflecting_reality_tpu.models.brushnet import BrushNetModel
from reflecting_reality_tpu.models.clip_text import CLIPTextModel
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL
from reflecting_reality_tpu.pipelines.brushnet_pipeline import StableDiffusionBrushNetPipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pipeline.npz")

TINY = dict(
    block_out_channels=(8, 16, 16, 16),
    attention_head_dim=2,
    cross_attention_dim=32,
    norm_num_groups=4,
    layers_per_block=2,
)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden pipeline data not generated")
    return np.load(GOLDEN)


def weights_of(golden, prefix):
    sd = {}
    for k in golden.files:
        if k.startswith(prefix + "::"):
            name = k.split("::", 1)[1]
            if name.endswith("position_ids"):  # torch buffer, not a param
                continue
            sd[name] = golden[k]
    return {"params": torch_to_flax_params(sd)}


class RecordedTokenizer:
    """Replays the reference run's token ids exactly."""

    def __init__(self, golden):
        self.prompt_ids = golden["prompt_ids"]
        self.uncond_ids = golden["uncond_ids"]

    def __call__(self, texts):
        return np.stack([
            self.uncond_ids if t == "" else self.prompt_ids for t in texts
        ])


def test_pipeline_matches_reference(golden):
    unet = UNet2DConditionModel(sample_size=8, **TINY)
    brushnet = BrushNetModel(conditioning_channels=6, **TINY)
    vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), norm_num_groups=4,
                        layers_per_block=1)
    text = CLIPTextModel(vocab_size=1000, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64)

    pipe = StableDiffusionBrushNetPipeline(
        vae=(vae, weights_of(golden, "vae")),
        text_encoder=(text, weights_of(golden, "text")),
        tokenizer=RecordedTokenizer(golden),
        unet=(unet, weights_of(golden, "unet")),
        brushnet=(brushnet, weights_of(golden, "brushnet")),
        depth_conditioning_mode="concat",
    )

    latents0 = jnp.asarray(np.moveaxis(golden["latents"], 1, -1))
    out = pipe(
        "a mirror",
        golden["image"],
        golden["mask"],
        depth=golden["depth"][:, :, None],
        num_inference_steps=int(golden["steps"]),
        guidance_scale=float(golden["cfg"]),
        latents=latents0,
        deterministic_vae_encode=True,
        output_type="latent",   # decoded float image, pre-uint8
    )
    ref = golden["final_image"]          # (H, W, 3) float in [0, 1]
    got = np.clip(np.asarray(out)[0] / 2.0 + 0.5, 0, 1)
    assert got.shape == ref.shape
    diff = np.abs(got - ref)
    assert diff.max() < 5e-3, f"max diff {diff.max()}"
    assert diff.mean() < 5e-4


def test_conditioning_latents_parity(golden):
    """The assembled conditioning tensor itself (VAE mode x sf + mask trick +
    nearest-interp depth concat) must match the reference's."""
    vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), norm_num_groups=4,
                        layers_per_block=1)
    text = CLIPTextModel(vocab_size=1000, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64)
    unet = UNet2DConditionModel(sample_size=8, **TINY)
    brushnet = BrushNetModel(conditioning_channels=6, **TINY)
    pipe = StableDiffusionBrushNetPipeline(
        vae=(vae, weights_of(golden, "vae")),
        text_encoder=(text, weights_of(golden, "text")),
        tokenizer=RecordedTokenizer(golden),
        unet=(unet, weights_of(golden, "unet")),
        brushnet=(brushnet, weights_of(golden, "brushnet")),
        depth_conditioning_mode="concat",
    )
    from reflecting_reality_tpu.pipelines.image_processor import interpolate_nearest

    image_np = pipe.image_processor.preprocess(golden["image"], 64, 64)
    mask_np = pipe.image_processor.preprocess(golden["mask"], 64, 64)
    mask_np = (mask_np.sum(-1, keepdims=True) < 0).astype(np.float32)
    cond = pipe._encode_mode(pipe.vae_params, jnp.asarray(image_np))
    mask_lat = interpolate_nearest(mask_np, 8, 8)
    depth_lat = interpolate_nearest(
        np.asarray(golden["depth"])[None, :, :, None], 8, 8
    )
    full = np.concatenate(
        [np.asarray(cond), mask_lat, depth_lat], axis=-1
    )
    ref = np.moveaxis(golden["cond_latents_mode"], 1, -1)
    np.testing.assert_allclose(full, ref, rtol=1e-4, atol=1e-5)


class TestSDXLPipelineParity:
    """End-to-end SDXL golden parity (reference pipeline_brushnet_sd_xl):
    dual text encoders (penultimate hidden-states concat + projected pooled),
    force_zeros_for_empty_prompt negatives, text_time micro-conditioning
    through unet AND brushnet, CFG 5.0.  Goldens from
    tests/golden/generate_golden_sdxl.py."""

    GOLDEN_XL = os.path.join(os.path.dirname(__file__), "golden", "sdxl_pipeline.npz")

    TINY_XL = dict(
        block_out_channels=(8, 16, 16, 16),
        attention_head_dim=2,
        cross_attention_dim=48,
        norm_num_groups=4,
        layers_per_block=2,
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
    )

    @pytest.fixture(scope="class")
    def xl(self):
        if not os.path.exists(self.GOLDEN_XL):
            pytest.skip("sdxl golden not generated")
        return np.load(self.GOLDEN_XL)

    def test_pipeline_matches_reference(self, xl):
        from reflecting_reality_tpu.models.clip_text import CLIPTextModelWithProjection
        from reflecting_reality_tpu.pipelines.brushnet_sdxl_pipeline import (
            StableDiffusionXLBrushNetPipeline,
        )

        unet = UNet2DConditionModel(sample_size=8, **self.TINY_XL)
        brushnet = BrushNetModel(conditioning_channels=5, **self.TINY_XL)
        vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), norm_num_groups=4,
                            layers_per_block=1)
        text1 = CLIPTextModel(vocab_size=1000, hidden_size=32, num_hidden_layers=2,
                              num_attention_heads=2, intermediate_size=64)
        text2 = CLIPTextModelWithProjection(
            vocab_size=1000, hidden_size=16, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=32, projection_dim=16,
            eos_token_id=999,
        )
        pipe = StableDiffusionXLBrushNetPipeline(
            vae=(vae, weights_of(xl, "vae")),
            text_encoder=(text1, weights_of(xl, "text")),
            text_encoder_2=(text2, weights_of(xl, "text2")),
            tokenizer=RecordedTokenizer(xl),
            tokenizer_2=RecordedTokenizer(xl),
            unet=(unet, weights_of(xl, "unet")),
            brushnet=(brushnet, weights_of(xl, "brushnet")),
            scaling_factor=float(xl["vae_scaling"]),
        )
        latents0 = jnp.asarray(np.moveaxis(xl["latents"], 1, -1))
        out = pipe(
            "a mirror",
            xl["image"],
            xl["mask"],
            num_inference_steps=int(xl["steps"]),
            guidance_scale=float(xl["cfg"]),
            latents=latents0,
            deterministic_vae_encode=True,
            output_type="latent",
        )
        ref = xl["final_image"]
        got = np.clip(np.asarray(out)[0] / 2.0 + 0.5, 0, 1)
        assert got.shape == ref.shape
        diff = np.abs(got - ref)
        assert diff.max() < 5e-3, f"max diff {diff.max()}"
        assert diff.mean() < 5e-4
