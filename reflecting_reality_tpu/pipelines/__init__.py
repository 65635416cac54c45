from reflecting_reality_tpu.pipelines.brushnet_pipeline import StableDiffusionBrushNetPipeline
from reflecting_reality_tpu.pipelines.brushnet_sdxl_pipeline import (
    StableDiffusionXLBrushNetPipeline,
)
from reflecting_reality_tpu.pipelines.image_processor import ImageProcessor

__all__ = [
    "ImageProcessor", "StableDiffusionBrushNetPipeline",
    "StableDiffusionXLBrushNetPipeline",
]
