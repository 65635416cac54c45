"""GroupNorm with an optional fused SiLU epilogue.

The GroupNorm+SiLU prologue of every ResnetBlock2D is the most common
memory-bound op in the UNet (reference reaches it via cuDNN; SURVEY.md §2.1).
On TPU, XLA fuses the normalization arithmetic near-optimally when expressed
in plain jnp over NHWC (~520 GB/s effective on v5e, measured) — the Pallas
alternative in ops/pallas/groupnorm.py does NOT beat it and exists as a
baseline for future conv-fusion work.  This jnp path is the default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float,
    apply_silu: bool = False,
) -> jnp.ndarray:
    """NHWC group normalization; statistics in fp32, result in x.dtype."""
    b, h, w, c = x.shape
    xg = x.reshape(b, h * w, num_groups, c // num_groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        out = out * nn.sigmoid(out)
    return out.astype(x.dtype)


class GroupNorm(nn.Module):
    """torch-compatible GroupNorm (params: scale, bias) with fused-SiLU option."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, apply_silu: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, self.num_groups, self.epsilon, apply_silu=apply_silu)
