"""IP-Adapter normals conditioning (reference: examples/brushnet/ip_adapter/
ip_adapter.py:50-112, attention_processor.py:282-307, wiring at
train_brushnet_mirror.py:1085-1123 and :74-88).

MirrorFusion's `normals_conditioning_mode="ip_adapter"` path:
1. the dataset reduces the normals map to ONE unit vector — the mean normal
   over the mirror mask (dataset.py:168-192) — shape (B, 1, 3);
2. `freq_encode` NeRF-style positional encoding (32 freqs, sin/cos,
   include_input=False) lifts it to (B, 1, 192);
3. `NormalProjModel` (Linear 192->cross_attention_dim + GELU) makes it one
   context token, concatenated AFTER the 77 text tokens;
4. every cross-attention in the base UNet splits off the trailing
   `ip_num_tokens` and attends to them through separate to_k_ip/to_v_ip
   (ops.attention.Attention ip fields), added with `ip_scale`.

Quirk kept verbatim: the reference instantiates IPAttnProcessor with its
default num_tokens=4 while appending a single normal token, so the split
point also claims the last 3 text tokens; checkpoints are trained with that
behavior, so `DEFAULT_NUM_TOKENS = 4`.

`init_ip_params_from_unet` reproduces the weight init: to_k_ip/to_v_ip start
as copies of each layer's to_k/to_v (train_brushnet_mirror.py:1102-1121).
"""

from __future__ import annotations

import copy
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

DEFAULT_NUM_TOKENS = 4
NORMALS_EMBED_DIM = 192  # 3 dims x 32 freqs x (sin, cos)


def freq_encode(
    x: jnp.ndarray,
    n_freqs: int = 32,
    max_freq_log2: float = 5.0,
    log_sampling: bool = True,
    include_input: bool = False,
) -> jnp.ndarray:
    """NeRF positional encoding over the last axis (reference FreqEncoder)."""
    if log_sampling:
        bands = 2.0 ** jnp.linspace(0.0, max_freq_log2, n_freqs)
    else:
        bands = jnp.linspace(1.0, 2.0**max_freq_log2, n_freqs)
    parts = [x] if include_input else []
    for f in bands:
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)


class NormalProjModel(nn.Module):
    """Linear(192 -> cross_attention_dim) + GELU (reference ip_adapter.py:97-112).
    Param path proj_0 maps to the torch Sequential's proj.0."""

    cross_attention_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, normal_embeds: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.cross_attention_dim, dtype=self.dtype, name="proj_0")(normal_embeds)
        return nn.gelu(x, approximate=False)


def normal_tokens(normal: jnp.ndarray, proj_params, cross_attention_dim: int = 768,
                  dtype=jnp.float32) -> jnp.ndarray:
    """(B, 1, 3) unit mirror normal -> (B, 1, cross_attention_dim) ip token
    (reference get_normal_embeds, train_brushnet_mirror.py:74-88)."""
    emb = freq_encode(normal.astype(jnp.float32))
    return NormalProjModel(cross_attention_dim, dtype=dtype).apply(proj_params, emb)


def is_ip_param_path(path) -> bool:
    """True for to_k_ip / to_v_ip leaves inside a unet param tree."""
    return any(p in ("to_k_ip", "to_v_ip") for p in path)


def init_ip_params_from_unet(ip_unet_params: dict, unet_params: dict) -> dict:
    """Copy each attention layer's to_k/to_v kernels into its to_k_ip/to_v_ip
    (reference :1102-1121); all other leaves copied from the plain unet."""
    out = copy.deepcopy(ip_unet_params)

    def walk(dst, src):
        for k, v in dst.items():
            if isinstance(v, dict):
                if k in ("to_k_ip", "to_v_ip"):
                    twin = k[:-3]  # to_k / to_v
                    if twin in src:
                        dst[k] = copy.deepcopy(src[twin])
                elif k in src:
                    walk(v, src[k])
            elif k in src and np.shape(src[k]) == np.shape(v):
                dst[k] = src[k]

    walk(out, unet_params)
    return out
