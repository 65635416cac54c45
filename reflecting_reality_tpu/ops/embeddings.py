"""Timestep embeddings (reference: src/diffusers/models/embeddings.py).

`get_timestep_embedding` reproduces the sinusoidal embedding math used by
SD-1.5 (flip_sin_to_cos=True, downscale_freq_shift=0), and
`TimestepEmbedding` the 2-layer SiLU MLP (torch names linear_1/linear_2).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings; computed in fp32 regardless of input dtype."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    exponent = -jnp.log(jnp.float32(max_period)) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """time_embedding MLP: linear_1 -> silu -> linear_2."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray, condition: jnp.ndarray | None = None) -> jnp.ndarray:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        if condition is not None:
            # cond_proj path (time_cond_proj_dim) is unused by SD-1.5/MirrorFusion.
            x = x + condition
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


def precompute_time_embeddings(module, params, timesteps: jnp.ndarray) -> jnp.ndarray:
    """Batch the sinusoid + time_embedding MLP over ALL sampler steps at once.

    Samplers pass the resulting (N, 4*bocs[0]) table's rows back into
    UNet2DConditionModel/BrushNetModel via their `temb` kwarg, hoisting the
    per-step timestep GEMMs out of the denoise scan (fused time-embedding
    GEMMs, benchmarks/PROFILE.md candidate).  `module` is the unet or
    brushnet; `params` its full param tree (the time_embedding subtree is
    extracted here, so the table is numerically identical to the in-scan
    path)."""
    bocs = module.block_out_channels
    t_emb = get_timestep_embedding(
        jnp.asarray(timesteps), bocs[0],
        flip_sin_to_cos=module.flip_sin_to_cos,
        downscale_freq_shift=module.freq_shift,
    ).astype(module.dtype)
    te = TimestepEmbedding(bocs[0] * 4, dtype=module.dtype)
    sub = {"params": params["params"]["time_embedding"]}
    return te.apply(sub, t_emb)
