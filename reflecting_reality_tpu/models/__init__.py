from reflecting_reality_tpu.models.brushnet import BrushNetModel, init_params_from_unet
from reflecting_reality_tpu.models.clip_text import (
    CLIPTextModel, CLIPTextModelWithProjection, load_text_encoder,
)
from reflecting_reality_tpu.models.clip_vision import (
    CLIPVisionModelWithProjection, load_vision_encoder,
)
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL, DiagonalGaussian

__all__ = [
    "AutoencoderKL", "BrushNetModel", "CLIPTextModel",
    "CLIPTextModelWithProjection", "CLIPVisionModelWithProjection",
    "DiagonalGaussian", "UNet2DConditionModel", "init_params_from_unet",
    "load_text_encoder", "load_vision_encoder",
]
