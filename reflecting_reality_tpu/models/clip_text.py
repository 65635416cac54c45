"""Minimal CLIP text encoder (the SD-1.5 text conditioning model).

The reference loads `CLIPTextModel` from HF transformers
(reference: examples/brushnet/train_brushnet_mirror.py:937-960) and uses only
`last_hidden_state`.  This is a self-contained linen reimplementation whose
param tree matches the torch checkpoint layout (`text_model.encoder.layers.N.
self_attn.q_proj...`) so openai/clip-vit-large-patch14 weights load through
core.io.torch_to_flax_params directly.

Math: token + position embeddings; 12 pre-LN transformer layers with causal
masking and quick_gelu MLPs; final LayerNorm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from reflecting_reality_tpu.core.config import ConfigMixin


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


class _CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        head_dim = self.hidden_size // self.num_heads
        dense = lambda name: nn.Dense(self.hidden_size, dtype=self.dtype, name=name)
        b, t, _ = x.shape
        q = dense("q_proj")(x).reshape(b, t, self.num_heads, head_dim)
        k = dense("k_proj")(x).reshape(b, t, self.num_heads, head_dim)
        v = dense("v_proj")(x).reshape(b, t, self.num_heads, head_dim)
        scale = 1.0 / jnp.sqrt(jnp.float32(head_dim))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * scale + causal_mask
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, self.hidden_size)
        return dense("out_proj")(out)


class _CLIPLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + _CLIPAttention(
            self.hidden_size, self.num_heads, dtype=self.dtype, name="self_attn"
        )(h, causal_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = _CLIPMLP(self.intermediate_size, self.hidden_size, dtype=self.dtype, name="mlp")(h)
        return x + h


class _CLIPMLP(nn.Module):
    intermediate_size: int
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(x)
        x = quick_gelu(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x)
        return x


class CLIPTextModel(nn.Module, ConfigMixin):
    vocab_size: int = 49408
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, output_hidden_states: bool = False):
        # Explicit nesting matches torch checkpoint paths text_model.embeddings.*
        return _TextModel(
            vocab_size=self.vocab_size,
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=self.intermediate_size,
            max_position_embeddings=self.max_position_embeddings,
            dtype=self.dtype,
            name="text_model",
        )(input_ids, output_hidden_states=output_hidden_states)

    def dummy_inputs(self):
        return (jnp.zeros((1, self.max_position_embeddings), jnp.int32),), {}


class CLIPTextModelWithProjection(nn.Module, ConfigMixin):
    """CLIP text tower + text_projection (SDXL's second encoder,
    laion/CLIP-ViT-bigG: pooled output = projected EOS-token hidden state).
    Param layout matches transformers (text_model.* + text_projection)."""

    vocab_size: int = 49408
    hidden_size: int = 1280
    num_hidden_layers: int = 32
    num_attention_heads: int = 20
    intermediate_size: int = 5120
    max_position_embeddings: int = 77
    projection_dim: int = 1280
    eos_token_id: int = 49407
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, output_hidden_states: bool = False):
        out = _TextModel(
            vocab_size=self.vocab_size,
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=self.intermediate_size,
            max_position_embeddings=self.max_position_embeddings,
            dtype=self.dtype,
            name="text_model",
        )(input_ids, output_hidden_states=output_hidden_states)
        last, hidden_states = out if output_hidden_states else (out, None)
        # pooled = hidden state at the (first) EOS position
        eos_pos = jnp.argmax((input_ids == self.eos_token_id).astype(jnp.int32), axis=1)
        pooled = last[jnp.arange(last.shape[0]), eos_pos]
        pooled = nn.Dense(self.projection_dim, use_bias=False, dtype=self.dtype,
                          name="text_projection")(pooled)
        if output_hidden_states:
            return last, pooled, hidden_states
        return last, pooled

    def dummy_inputs(self):
        return (jnp.zeros((1, self.max_position_embeddings), jnp.int32),), {}


class _Embeddings(nn.Module):
    vocab_size: int
    hidden_size: int
    max_position_embeddings: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        tok = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype, name="token_embedding")
        pos = nn.Embed(
            self.max_position_embeddings, self.hidden_size, dtype=self.dtype,
            name="position_embedding",
        )
        t = input_ids.shape[1]
        positions = jnp.arange(t)[None, :]
        return tok(input_ids) + pos(positions)


class _Encoder(nn.Module):
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray,
                 output_hidden_states: bool = False):
        hidden_states = [x]
        for i in range(self.num_hidden_layers):
            x = _CLIPLayer(
                self.hidden_size, self.num_attention_heads, self.intermediate_size,
                dtype=self.dtype, name=f"layers_{i}",
            )(x, causal_mask)
            hidden_states.append(x)
        if output_hidden_states:
            return x, hidden_states
        return x


class _TextModel(nn.Module):
    vocab_size: int
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    max_position_embeddings: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, output_hidden_states: bool = False):
        t = input_ids.shape[1]
        x = _Embeddings(
            self.vocab_size, self.hidden_size, self.max_position_embeddings,
            dtype=self.dtype, name="embeddings",
        )(input_ids)
        causal_mask = jnp.triu(jnp.full((t, t), -jnp.inf, dtype=jnp.float32), k=1)[None, None]
        enc = _Encoder(
            self.hidden_size, self.num_hidden_layers, self.num_attention_heads,
            self.intermediate_size, dtype=self.dtype, name="encoder",
        )
        if output_hidden_states:
            x, hidden_states = enc(x, causal_mask, output_hidden_states=True)
        else:
            x = enc(x, causal_mask)
        last = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        if output_hidden_states:
            return last, hidden_states
        return last


def load_text_encoder(base_path: str, subfolder: str = "text_encoder",
                      dtype=jnp.float32):
    """(module, params) from a transformers-layout checkpoint folder
    (config.json + model.safetensors), the layout SD checkpoints ship
    (reference train_brushnet_mirror.py:937-960)."""
    import json
    import os

    from reflecting_reality_tpu.core.io import load_safetensors, torch_to_flax_params

    root = os.path.join(base_path, subfolder)
    cfg = {}
    cfg_path = os.path.join(root, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = json.load(f)
        cfg = {
            k: raw[k]
            for k in ("vocab_size", "hidden_size", "num_hidden_layers",
                      "num_attention_heads", "intermediate_size",
                      "max_position_embeddings")
            if k in raw
        }
    module = CLIPTextModel(dtype=dtype, **cfg)
    weights = None
    for name in ("model.safetensors", "pytorch_model.safetensors"):
        path = os.path.join(root, name)
        if os.path.exists(path):
            weights = load_safetensors(path)
            break
    if weights is None:
        raise FileNotFoundError(f"no text encoder weights under {root}")
    from reflecting_reality_tpu.core.io import validate_loaded_params

    # position_ids is a persistent torch buffer in older transformers
    # exports, not a parameter
    weights = {k: v for k, v in weights.items() if not k.endswith("position_ids")}
    params = {"params": torch_to_flax_params(weights)}
    validate_loaded_params(module, params, where=root)
    return module, params
