"""reflecting_reality_tpu — TPU-native MirrorFusion.

A from-scratch JAX/Flax/Pallas rebuild of val-iisc/Reflecting-Reality
(MirrorFusion, 3DV 2025): depth-conditioned mirror-reflection inpainting as
a BrushNet-style dual-branch SD-1.5 system.  Compute path is jit/pjit over
NHWC flax modules with Pallas flash attention; the public surface mirrors
the reference (pipelines, train/test/eval CLIs, checkpoint layout).

Heavy submodules import lazily so `import reflecting_reality_tpu` stays
cheap in dataloader workers.
"""

from importlib import import_module
from typing import Any

__version__ = "0.1.0"

_LAZY = {
    "UNet2DConditionModel": "reflecting_reality_tpu.models.unet2d",
    "BrushNetModel": "reflecting_reality_tpu.models.brushnet",
    "AutoencoderKL": "reflecting_reality_tpu.models.vae",
    "CLIPTextModel": "reflecting_reality_tpu.models.clip_text",
    "StableDiffusionBrushNetPipeline": "reflecting_reality_tpu.pipelines.brushnet_pipeline",
    "NoiseSchedule": "reflecting_reality_tpu.schedulers.common",
    "UniPCSampler": "reflecting_reality_tpu.schedulers.unipc",
    "HDF5Dataset": "reflecting_reality_tpu.data.synmirror",
    "MSDDataset": "reflecting_reality_tpu.data.synmirror",
    "CLIPTokenizer": "reflecting_reality_tpu.data.tokenizer",
    "TrainConfig": "reflecting_reality_tpu.training.train_step",
    "make_train_step": "reflecting_reality_tpu.training.train_step",
    "MetricsCalculator": "reflecting_reality_tpu.metrics.calculator",
    "LatentCachedDataset": "reflecting_reality_tpu.data.latent_cache",
    "enable_compilation_cache": "reflecting_reality_tpu.core.jit_cache",
}

__all__ = sorted(_LAZY) + ["__version__"]


def __getattr__(name: str) -> Any:
    module = _LAZY.get(name)
    if module is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    return getattr(import_module(module), name)
