from reflecting_reality_tpu.ops.attention import (
    Attention, dot_product_attention, get_attention_backend, set_attention_backend,
)
from reflecting_reality_tpu.ops.norms import GroupNorm, group_norm
from reflecting_reality_tpu.ops.resnet import Downsample2D, ResnetBlock2D, Upsample2D
from reflecting_reality_tpu.ops.transformer import BasicTransformerBlock, Transformer2DModel

__all__ = [
    "Attention", "BasicTransformerBlock", "Downsample2D", "GroupNorm",
    "ResnetBlock2D", "Transformer2DModel", "Upsample2D",
    "dot_product_attention", "get_attention_backend", "group_norm",
    "set_attention_backend",
]
