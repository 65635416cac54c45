"""Full-scale (real SD-1.5 config) weight-loading harness.

Round 1 proved the torch->flax key mapping only on tiny randomly-initialized
configs; this file proves it at real checkpoint scale, against the reference
implementation itself instantiated from the exact production configs:

- every key of the real UNet / VAE / BrushNet / CLIP state dicts maps onto
  our modules with zero missing / unexpected / mismatched entries
  (core.io.validate_loaded_params, wired into load_pretrained);
- known real-scale traps: attention_head_dim scalar-vs-list and per-block
  transformer_layers_per_block (reference models/brushnet.py:186-192),
  VAE mid-block attention naming vintages
  (modeling_utils.py:929-971 _convert_deprecated_attention_blocks);
- (slow) reference save_pretrained folders load through load_pretrained
  end-to-end, and our from_unet surgery reproduces the reference's
  BrushNetModel.from_unet weights bit-exactly at full scale.

Fast tests run in the default suite (~1 min, in-memory fp16 state dicts);
tests marked `slow` write multi-GB checkpoints and need RR_RUN_SLOW=1.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/MirrorFusion/src")

torch = pytest.importorskip("torch")

from reflecting_reality_tpu.core.io import (  # noqa: E402
    WeightMappingError,
    convert_deprecated_attention_keys,
    torch_to_flax_params,
    validate_loaded_params,
)

# The exact runwayml/stable-diffusion-v1-5 component configs (the fields the
# published config.json pins; the rest are the fork's defaults, which the
# published files also carry — diffusers v0.27 lineage).
SD15_UNET = dict(
    sample_size=64,
    in_channels=4,
    out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                      "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                    "CrossAttnUpBlock2D"),
    block_out_channels=(320, 640, 1280, 1280),
    layers_per_block=2,
    attention_head_dim=8,
    cross_attention_dim=768,
)
SD15_VAE = dict(
    sample_size=512,
    in_channels=3,
    out_channels=3,
    down_block_types=("DownEncoderBlock2D",) * 4,
    up_block_types=("UpDecoderBlock2D",) * 4,
    block_out_channels=(128, 256, 512, 512),
    layers_per_block=2,
    latent_channels=4,
    norm_num_groups=32,
    scaling_factor=0.18215,
)
SD15_TEXT = dict(
    vocab_size=49408,
    hidden_size=768,
    intermediate_size=3072,
    num_hidden_layers=12,
    num_attention_heads=12,
    max_position_embeddings=77,
)


def fp16_state(model) -> dict:
    """In-memory torch state dict as fp16 numpy (halves the full-scale RAM;
    only names/shapes matter for mapping validation)."""
    return {k: v.detach().half().numpy() for k, v in model.state_dict().items()}


def to_flax(sd):
    return {"params": torch_to_flax_params(convert_deprecated_attention_keys(dict(sd)))}


@pytest.fixture(scope="module")
def ref_unet():
    from diffusers import UNet2DConditionModel as TorchUNet

    with torch.no_grad():
        return TorchUNet(**SD15_UNET)


class TestRealScaleKeyMapping:
    @pytest.mark.medium
    def test_sd15_unet(self, ref_unet):
        from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel

        module = UNet2DConditionModel.from_config(dict(ref_unet.config))
        validate_loaded_params(module, to_flax(fp16_state(ref_unet)), "sd15-unet")

    @pytest.mark.medium
    def test_sd15_brushnet_from_unet(self, ref_unet):
        from diffusers import BrushNetModel as TorchBrushNet

        from reflecting_reality_tpu.models.brushnet import BrushNetModel

        with torch.no_grad():
            ref = TorchBrushNet.from_unet(ref_unet, conditioning_channels=6)
        cfg = BrushNetModel.config_from_unet(ref_unet.config, conditioning_channels=6)
        module = BrushNetModel.from_config(cfg)
        validate_loaded_params(module, to_flax(fp16_state(ref)), "sd15-brushnet")
        # the surgery contract: 28 zero-conv residual projections
        zero_keys = [k for k in ref.state_dict() if "brushnet_" in k and "weight" in k]
        assert len(zero_keys) == 28

    def test_sd15_vae(self):
        from diffusers import AutoencoderKL as TorchVAE

        from reflecting_reality_tpu.models.vae import AutoencoderKL

        with torch.no_grad():
            ref = TorchVAE(**SD15_VAE)
        module = AutoencoderKL.from_config(dict(ref.config))
        validate_loaded_params(module, to_flax(fp16_state(ref)), "sd15-vae")

    def test_sd15_vae_deprecated_attention_naming(self):
        """Old checkpoint vintages name the mid-block attention
        query/key/value/proj_attn (some as (C,C,1,1) convs); both vintages
        must produce the identical flax tree."""
        from diffusers import AutoencoderKL as TorchVAE

        from reflecting_reality_tpu.models.vae import AutoencoderKL

        with torch.no_grad():
            ref = TorchVAE(**SD15_VAE)
        modern = fp16_state(ref)
        renames = {"to_q": "query", "to_k": "key", "to_v": "value",
                   "to_out.0": "proj_attn"}
        old = {}
        for k, v in modern.items():
            for new, dep in renames.items():
                if f".{new}." in k and "attentions" in k:
                    k = k.replace(f".{new}.", f".{dep}.")
                    if k.endswith("weight") and v.ndim == 2:
                        v = v[:, :, None, None]  # oldest 1x1-conv form
                    break
            old[k] = v
        assert any(".query." in k for k in old)

        module = AutoencoderKL.from_config(dict(ref.config))
        got_old = to_flax(old)
        validate_loaded_params(module, got_old, "sd15-vae-deprecated")
        got_modern = to_flax(modern)
        flat_old = {"/".join(p): v for p, v in _flatten(got_old)}
        flat_new = {"/".join(p): v for p, v in _flatten(got_modern)}
        assert flat_old.keys() == flat_new.keys()
        for k in flat_new:
            np.testing.assert_array_equal(flat_old[k], flat_new[k])

    def test_sd15_text_encoder(self):
        from transformers import CLIPTextConfig, CLIPTextModel as TorchText

        from reflecting_reality_tpu.models.clip_text import CLIPTextModel

        with torch.no_grad():
            ref = TorchText(CLIPTextConfig(**SD15_TEXT))
        sd = {k: v for k, v in fp16_state(ref).items()
              if not k.endswith("position_ids")}
        module = CLIPTextModel(**SD15_TEXT)
        validate_loaded_params(module, to_flax(sd), "sd15-text")

    def test_validation_catches_a_dropped_key(self, ref_unet):
        from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel

        module = UNet2DConditionModel.from_config(dict(ref_unet.config))
        sd = fp16_state(ref_unet)
        sd.pop("mid_block.resnets.0.conv1.weight")
        sd["mid_block.resnets.0.conv1.weigth"] = np.zeros((2, 2), np.float16)
        with pytest.raises(WeightMappingError) as e:
            validate_loaded_params(module, to_flax(sd), "sd15-unet-corrupt")
        assert "missing" in str(e.value) and "unexpected" in str(e.value)


class TestConfigTraps:
    """Per-block list configs (the SDXL-style quirks VERDICT flags)."""

    TRAP = dict(
        sample_size=32,
        in_channels=4,
        out_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(64, 128, 256),
        layers_per_block=2,
        attention_head_dim=(2, 4, 8),          # list, not scalar
        transformer_layers_per_block=(1, 2, 4),  # per-block depths
        cross_attention_dim=128,
        norm_num_groups=32,
    )

    def test_per_block_lists_map(self):
        from diffusers import UNet2DConditionModel as TorchUNet

        from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel

        with torch.no_grad():
            ref = TorchUNet(**self.TRAP)
        module = UNet2DConditionModel.from_config(dict(ref.config))
        validate_loaded_params(module, to_flax(fp16_state(ref)), "trap-unet")

    def test_sdxl_text_time_maps(self):
        from diffusers import UNet2DConditionModel as TorchUNet

        from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel

        cfg = dict(self.TRAP, addition_embed_type="text_time",
                   addition_time_embed_dim=64,
                   projection_class_embeddings_input_dim=64 * 6 + 128)
        with torch.no_grad():
            ref = TorchUNet(**cfg)
        module = UNet2DConditionModel.from_config(dict(ref.config))
        validate_loaded_params(module, to_flax(fp16_state(ref)), "trap-sdxl-unet")


class TestSDXLFullScale:
    """Real stabilityai/stable-diffusion-xl-base-1.0 UNet config (the SDXL
    checkpoint layout VERDICT r3 item 7 asks to pin at full scale): per-block
    transformer depths (1,2,10), heads (5,10,20), text_time added-cond with
    projection dim 2816, cross_attention_dim 2048."""

    SDXL_UNET = dict(
        sample_size=128,
        in_channels=4,
        out_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D",
                          "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                        "UpBlock2D"),
        block_out_channels=(320, 640, 1280),
        layers_per_block=2,
        attention_head_dim=(5, 10, 20),
        transformer_layers_per_block=(1, 2, 10),
        cross_attention_dim=2048,
        addition_embed_type="text_time",
        addition_time_embed_dim=256,
        projection_class_embeddings_input_dim=2816,
        use_linear_projection=True,
    )

    @pytest.mark.medium
    def test_sdxl_base_unet(self):
        from diffusers import UNet2DConditionModel as TorchUNet

        from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel

        with torch.no_grad():
            ref = TorchUNet(**self.SDXL_UNET)
        module = UNet2DConditionModel.from_config(dict(ref.config))
        validate_loaded_params(module, to_flax(fp16_state(ref)), "sdxl-unet")

    @pytest.mark.medium
    def test_sdxl_brushnet_from_unet(self):
        """BrushNetModel.from_unet over the SDXL config: conv-only twin with
        the SDXL text_time embedding and its per-resnet zero-conv stacks."""
        from diffusers import BrushNetModel as TorchBrushNet
        from diffusers import UNet2DConditionModel as TorchUNet

        from reflecting_reality_tpu.models.brushnet import BrushNetModel

        with torch.no_grad():
            ref_unet = TorchUNet(**self.SDXL_UNET)
            ref = TorchBrushNet.from_unet(ref_unet, conditioning_channels=5)
        cfg = BrushNetModel.config_from_unet(ref_unet.config,
                                             conditioning_channels=5)
        module = BrushNetModel.from_config(cfg)
        validate_loaded_params(module, to_flax(fp16_state(ref)), "sdxl-brushnet")


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


@pytest.mark.slow
class TestFullScaleDiskRoundtrip:
    """Reference save_pretrained folders -> our load_pretrained (the real
    checkpoint-loading path, multi-GB on disk)."""

    def test_unet_folder_load(self, ref_unet, tmp_path):
        from reflecting_reality_tpu.core.io import load_pretrained
        from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel

        ref_unet.save_pretrained(tmp_path / "unet")
        module, params = load_pretrained(
            UNet2DConditionModel, str(tmp_path), subfolder="unet")
        assert module.block_out_channels == (320, 640, 1280, 1280)

    def test_vae_folder_load(self, tmp_path):
        from diffusers import AutoencoderKL as TorchVAE

        from reflecting_reality_tpu.core.io import load_pretrained
        from reflecting_reality_tpu.models.vae import AutoencoderKL

        with torch.no_grad():
            ref = TorchVAE(**SD15_VAE)
        ref.save_pretrained(tmp_path / "vae")
        module, params = load_pretrained(AutoencoderKL, str(tmp_path), subfolder="vae")
        assert module.block_out_channels == (128, 256, 512, 512)

    def test_from_unet_surgery_matches_reference_fullscale(self, ref_unet):
        """Our init_params_from_unet == reference BrushNetModel.from_unet,
        leaf for leaf, at real SD-1.5 scale (reference brushnet.py:452-530:
        conv_in duplication into [:, :4] and [:, 4:8], zero cond extras,
        time embedding copy, strict=False block transfer, zero convs)."""
        import jax

        from diffusers import BrushNetModel as TorchBrushNet

        from reflecting_reality_tpu.models.brushnet import (
            BrushNetModel, init_params_from_unet,
        )

        with torch.no_grad():
            ref = TorchBrushNet.from_unet(ref_unet, conditioning_channels=6)
        ref_params = to_flax({k: v.detach().numpy()
                              for k, v in ref.state_dict().items()})["params"]

        unet_params = to_flax({k: v.detach().numpy()
                               for k, v in ref_unet.state_dict().items()})["params"]
        cfg = BrushNetModel.config_from_unet(ref_unet.config, conditioning_channels=6)
        module = BrushNetModel.from_config(cfg)
        args, kwargs = module.dummy_inputs()
        fresh = jax.jit(module.init)(jax.random.PRNGKey(0), *args, **kwargs)
        ours = init_params_from_unet(jax.device_get(fresh)["params"], unet_params)

        flat_ref = {"/".join(p): v for p, v in _flatten(ref_params)}
        flat_ours = {"/".join(p): v for p, v in _flatten(ours)}
        assert flat_ref.keys() == flat_ours.keys()
        for k, v in flat_ref.items():
            np.testing.assert_array_equal(
                v, np.asarray(flat_ours[k], v.dtype), err_msg=k)
