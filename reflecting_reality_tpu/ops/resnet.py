"""ResnetBlock2D and up/down sampling (reference: src/diffusers/models/resnet.py,
upsampling.py, downsampling.py), in NHWC.

Forward contract (time_embedding_norm="default", output_scale_factor=1):
  h = conv1(silu(norm1(x)))
  h = h + time_emb_proj(silu(temb))[:, None, None, :]
  h = conv2(dropout(silu(norm2(h))))
  out = (shortcut(x) + h) / output_scale_factor
with a 1x1 conv_shortcut iff in/out channels differ.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from reflecting_reality_tpu.ops.norms import GroupNorm


class ResnetBlock2D(nn.Module):
    in_channels: int
    out_channels: Optional[int] = None
    groups: int = 32
    eps: float = 1e-6
    output_scale_factor: float = 1.0
    use_temb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        out_channels = self.out_channels or self.in_channels
        conv = lambda name: nn.Conv(
            out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name=name
        )

        h = GroupNorm(num_groups=self.groups, epsilon=self.eps, name="norm1")(x, apply_silu=True)
        h = conv("conv1")(h)

        if self.use_temb and temb is not None:
            temb_proj = nn.Dense(out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + temb_proj[:, None, None, :]

        h = GroupNorm(num_groups=self.groups, epsilon=self.eps, name="norm2")(h, apply_silu=True)
        h = conv("conv2")(h)

        if out_channels != self.in_channels:
            x = nn.Conv(out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)

        out = x + h
        if self.output_scale_factor != 1.0:
            out = out / self.output_scale_factor
        return out


class Downsample2D(nn.Module):
    """3x3 stride-2 conv with torch-style asymmetric padding option.

    The UNet uses padding=1 (symmetric); the VAE encoder uses padding=0 with a
    manual (0,1)x(0,1) pad (reference: downsampling.py Downsample2D.forward).
    """

    out_channels: int
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.padding == 0:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = ((0, 0), (0, 0))
        else:
            pad = ((self.padding, self.padding),) * 2
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=pad, dtype=self.dtype, name="conv"
        )(x)


class Upsample2D(nn.Module):
    """Nearest x2 (or to explicit output size) followed by a 3x3 conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, output_size: Optional[tuple] = None) -> jnp.ndarray:
        b, h, w, c = x.shape
        if output_size is None:
            # Exact nearest x2: repeat rows/cols (matches F.interpolate nearest).
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        else:
            oh, ow = output_size
            # torch nearest: src_idx = floor(dst_idx * in/out)
            ridx = (jnp.arange(oh) * h // oh).astype(jnp.int32)
            cidx = (jnp.arange(ow) * w // ow).astype(jnp.int32)
            x = x[:, ridx][:, :, cidx]
        return nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv"
        )(x)
