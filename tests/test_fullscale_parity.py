"""Full-scale generation parity: the reference StableDiffusionBrushNetPipeline
and ours must produce the same 512x512 image from the SAME real-SD-1.5-sized
weights (random values, production shapes), 20 UniPC steps, CFG 7.5, depth
concat — on CPU, fp32 both sides (VERDICT round-1 item 1b).

Weights travel through the REAL checkpoint path: the reference's
save_pretrained folders -> our core.io.load_pretrained (key-mapping
validation on).  Everything is generated in-process (nothing multi-GB is
committed); runtime is ~30-45 min on the 1-vCPU box, hence `slow`
(RR_RUN_SLOW=1).

Reference: pipeline_brushnet.py:848 __call__, test protocol
test_brushnet.py:288-310 (50 steps in production; 20 here per the VERDICT
recipe — enough steps for divergence to compound if the math differed).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/MirrorFusion/src")

torch = pytest.importorskip("torch")

from tests.test_fullscale_io import SD15_TEXT, SD15_UNET, SD15_VAE  # noqa: E402

H = W = 512
STEPS = 20
CFG = 7.5
PSNR_TARGET_DB = 45.0


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


@pytest.mark.slow
def test_fullscale_generation_parity(tmp_path):
    from diffusers import (
        AutoencoderKL,
        BrushNetModel,
        UNet2DConditionModel,
        UniPCMultistepScheduler,
    )
    from diffusers.models.autoencoders.vae import DiagonalGaussianDistribution
    from diffusers.pipelines.brushnet.pipeline_brushnet import (
        StableDiffusionBrushNetPipeline,
    )
    from transformers import CLIPTextConfig, CLIPTextModel

    # --- reference side (torch, fp32, CPU) --------------------------------
    torch.manual_seed(0)
    DiagonalGaussianDistribution.sample = lambda self, generator=None: self.mode()

    with torch.no_grad():
        unet = UNet2DConditionModel(**SD15_UNET)
        brushnet = BrushNetModel.from_unet(unet, conditioning_channels=6)
        for name, p in brushnet.named_parameters():
            if "brushnet_" in name:
                p.copy_(torch.randn_like(p) * 0.05)
        vae = AutoencoderKL(**SD15_VAE)
        text = CLIPTextModel(CLIPTextConfig(**SD15_TEXT))

    from tests.tiny_checkpoint import write_char_tokenizer

    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    write_char_tokenizer(str(tok_dir))
    from transformers import CLIPTokenizer

    tokenizer = CLIPTokenizer(
        vocab_file=str(tok_dir / "vocab.json"),
        merges_file=str(tok_dir / "merges.txt"),
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
    mask[H // 4: 3 * H // 4, W // 4: 3 * W // 4] = 255
    depth = (rng.rand(H, W) * 2 - 1).astype(np.float32)
    latents0 = rng.randn(1, 4, H // 8, W // 8).astype(np.float32)
    prompt = "a mirror"

    from PIL import Image

    with torch.no_grad():
        ref_img = pipe(
            prompt,
            Image.fromarray(image),
            Image.fromarray(mask),
            depth=torch.tensor(depth)[None, None],
            num_inference_steps=STEPS,
            guidance_scale=CFG,
            latents=torch.tensor(latents0),
            generator=torch.Generator().manual_seed(123),
            output_type="np",
        ).images[0]

    prompt_ids = np.asarray(
        tokenizer(prompt, max_length=77, padding="max_length",
                  truncation=True)["input_ids"], np.int32)
    uncond_ids = np.asarray(
        tokenizer("", max_length=77, padding="max_length",
                  truncation=True)["input_ids"], np.int32)

    # real checkpoint folders (the load path under test)
    unet.save_pretrained(tmp_path / "unet")
    brushnet.save_pretrained(tmp_path / "brushnet")
    vae.save_pretrained(tmp_path / "vae")
    text_sd = {k: v for k, v in text.state_dict().items()
               if not k.endswith("position_ids")}
    del pipe, unet, brushnet, vae

    # --- our side (jax, fp32, CPU) ----------------------------------------
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from reflecting_reality_tpu.core.io import (
        load_pretrained, torch_to_flax_params, validate_loaded_params,
    )
    from reflecting_reality_tpu.models.brushnet import BrushNetModel as OurBrushNet
    from reflecting_reality_tpu.models.clip_text import CLIPTextModel as OurText
    from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel as OurUNet
    from reflecting_reality_tpu.models.vae import AutoencoderKL as OurVAE
    from reflecting_reality_tpu.pipelines.brushnet_pipeline import (
        StableDiffusionBrushNetPipeline as OurPipeline,
    )

    our_unet = load_pretrained(OurUNet, str(tmp_path / "unet"))
    our_brushnet = load_pretrained(OurBrushNet, str(tmp_path / "brushnet"))
    our_vae = load_pretrained(OurVAE, str(tmp_path / "vae"))
    text_params = {"params": torch_to_flax_params(
        {k: v.numpy() for k, v in text_sd.items()})}
    our_text = OurText(**SD15_TEXT)
    validate_loaded_params(our_text, text_params, "fullscale-text")

    class RecordedTokenizer:
        def __call__(self, texts):
            return np.stack([uncond_ids if t == "" else prompt_ids for t in texts])

    our_pipe = OurPipeline(
        vae=our_vae,
        text_encoder=(our_text, text_params),
        tokenizer=RecordedTokenizer(),
        unet=our_unet,
        brushnet=our_brushnet,
        depth_conditioning_mode="concat",
    )
    out = our_pipe(
        prompt,
        image,
        mask,
        depth=depth[:, :, None],
        num_inference_steps=STEPS,
        guidance_scale=CFG,
        latents=jnp.asarray(np.moveaxis(latents0, 1, -1)),
        deterministic_vae_encode=True,
        dispatch="per_step",   # one step compiles much faster than the scan
        output_type="latent",
    )
    got = np.clip(np.asarray(out)[0] / 2.0 + 0.5, 0, 1)

    assert got.shape == ref_img.shape
    psnr = _psnr(got, ref_img)
    print(f"fullscale 20-step 512^2 parity: PSNR {psnr:.2f} dB "
          f"(max|diff| {np.abs(got - ref_img).max():.2e})")
    assert psnr > PSNR_TARGET_DB, f"PSNR {psnr:.2f} dB < {PSNR_TARGET_DB}"
