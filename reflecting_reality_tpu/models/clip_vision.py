"""CLIP vision tower (ViT) with projection — the image half of
CLIP_Similarity / Aesthetic_Score (reference: metrics/metrics.py:86-106 and
:191-194 reach it via open_clip / torchmetrics.clip_score with
openai/clip-vit-large-patch14).

Param layout matches transformers' CLIPVisionModelWithProjection
(vision_model.embeddings/encoder/..., visual_projection) so the HF
checkpoint loads through core.io.torch_to_flax_params.  Preprocessing
reproduces the CLIP transform: bicubic resize shorter-side to image_size,
center crop, [0,1], normalize with the CLIP mean/std.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from reflecting_reality_tpu.core.config import ConfigMixin
from reflecting_reality_tpu.models.clip_text import _CLIPLayer, quick_gelu  # noqa: F401

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(image: np.ndarray, image_size: int = 224) -> np.ndarray:
    """uint8/float HWC (any size) -> (1, S, S, 3) CLIP-normalized."""
    from reflecting_reality_tpu.data.synmirror import _center_crop, _resize_shorter_bicubic

    x = np.asarray(image)
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 255.0
    x = _center_crop(_resize_shorter_bicubic(x.astype(np.float32), image_size), image_size)
    x = (x - CLIP_MEAN) / CLIP_STD
    return x[None]


class _VisionEmbeddings(nn.Module):
    hidden_size: int
    image_size: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        b = pixel_values.shape[0]
        n = (self.image_size // self.patch_size) ** 2
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.hidden_size,), jnp.float32)
        patches = nn.Conv(
            self.hidden_size, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), use_bias=False,
            dtype=self.dtype, name="patch_embedding",
        )(pixel_values)
        patches = patches.reshape(b, n, self.hidden_size)
        cls_tok = jnp.broadcast_to(cls.astype(patches.dtype), (b, 1, self.hidden_size))
        x = jnp.concatenate([cls_tok, patches], axis=1)
        pos = nn.Embed(n + 1, self.hidden_size, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(n + 1)[None])
        return x + pos


class _VisionEncoder(nn.Module):
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        zero_mask = jnp.zeros((1, 1, 1, 1), jnp.float32)  # bidirectional
        for i in range(self.num_hidden_layers):
            x = _CLIPLayer(
                self.hidden_size, self.num_attention_heads,
                self.intermediate_size, dtype=self.dtype, name=f"layers_{i}",
            )(x, zero_mask)
        return x


class _VisionModel(nn.Module):
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    image_size: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        x = _VisionEmbeddings(
            self.hidden_size, self.image_size, self.patch_size, self.dtype,
            name="embeddings",
        )(pixel_values)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_layrnorm")(x)
        x = _VisionEncoder(
            self.hidden_size, self.num_hidden_layers, self.num_attention_heads,
            self.intermediate_size, dtype=self.dtype, name="encoder",
        )(x)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_layernorm")(x[:, 0])
        return x, pooled


class CLIPVisionModelWithProjection(nn.Module, ConfigMixin):
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, S, S, 3) -> (last_hidden (B,N+1,H), image_embeds (B,proj))."""
        last, pooled = _VisionModel(
            self.hidden_size, self.num_hidden_layers, self.num_attention_heads,
            self.intermediate_size, self.image_size, self.patch_size,
            dtype=self.dtype, name="vision_model",
        )(pixel_values)
        image_embeds = nn.Dense(
            self.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(pooled)
        return last, image_embeds


def load_vision_encoder(path: str, subfolder: str | None = None, dtype=jnp.float32):
    """(module, params) from a transformers CLIPVisionModelWithProjection
    checkpoint folder."""
    import json
    import os

    from reflecting_reality_tpu.core.io import load_safetensors, torch_to_flax_params

    root = os.path.join(path, subfolder) if subfolder else path
    cfg = {}
    cfg_path = os.path.join(root, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = json.load(f)
        raw = raw.get("vision_config", raw)
        cfg = {
            k: raw[k]
            for k in ("hidden_size", "num_hidden_layers", "num_attention_heads",
                      "intermediate_size", "image_size", "patch_size",
                      "projection_dim")
            if k in raw
        }
    module = CLIPVisionModelWithProjection(dtype=dtype, **cfg)
    weights = None
    for name in ("model.safetensors", "pytorch_model.safetensors"):
        p = os.path.join(root, name)
        if os.path.exists(p):
            weights = load_safetensors(p)
            break
    if weights is None:
        raise FileNotFoundError(f"no vision encoder weights under {root}")
    return module, {"params": torch_to_flax_params(weights)}
