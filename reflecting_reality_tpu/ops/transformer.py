"""Transformer2DModel / BasicTransformerBlock / GEGLU feed-forward
(reference: src/diffusers/models/transformers/transformer_2d.py:44,
models/attention.py:97).

SD-1.5 uses use_linear_projection=False: GroupNorm -> 1x1 conv proj_in ->
flatten to tokens -> [self-attn, cross-attn, GEGLU-FF] x N -> 1x1 conv
proj_out -> residual add.  LayerNorm eps is 1e-5 (torch default).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from reflecting_reality_tpu.ops.attention import Attention
from reflecting_reality_tpu.ops.norms import GroupNorm


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """ff.net.0 = GEGLU(dim -> 4*dim), ff.net.2 = Dense(4*dim -> dim)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        x = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)
        return x


class BasicTransformerBlock(nn.Module):
    dim: int
    num_attention_heads: int
    attention_head_dim: int
    cross_attention_dim: Optional[int] = None
    ip_num_tokens: Optional[int] = None    # IP-Adapter on attn2 only
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, encoder_hidden_states: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        attn = lambda cross, name: Attention(
            query_dim=self.dim,
            heads=self.num_attention_heads,
            dim_head=self.attention_head_dim,
            cross_attention_dim=self.cross_attention_dim if cross else None,
            ip_num_tokens=self.ip_num_tokens if cross else None,
            ip_scale=self.ip_scale,
            dtype=self.dtype,
            name=name,
        )
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)

        x = attn(False, "attn1")(ln("norm1")(x)) + x
        x = attn(True, "attn2")(ln("norm2")(x), encoder_hidden_states=encoder_hidden_states) + x
        x = FeedForward(self.dim, dtype=self.dtype, name="ff")(ln("norm3")(x)) + x
        return x


class Transformer2DModel(nn.Module):
    in_channels: int
    num_attention_heads: int
    attention_head_dim: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    norm_num_groups: int = 32
    use_linear_projection: bool = False
    ip_num_tokens: Optional[int] = None
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, encoder_hidden_states: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, h, w, c = x.shape
        inner_dim = self.num_attention_heads * self.attention_head_dim
        residual = x

        x = GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(inner_dim, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(inner_dim, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, inner_dim)

        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=inner_dim,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                ip_num_tokens=self.ip_num_tokens,
                ip_scale=self.ip_scale,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(x, encoder_hidden_states=encoder_hidden_states)

        if self.use_linear_projection:
            x = nn.Dense(self.in_channels, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, self.in_channels)
        else:
            x = x.reshape(b, h, w, inner_dim)
            x = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype, name="proj_out")(x)

        return x + residual
