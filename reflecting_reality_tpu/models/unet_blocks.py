"""UNet block zoo (reference: src/diffusers/models/unets/unet_2d_blocks.py).

Implements the blocks MirrorFusion exercises, with the BrushNet extensions:

- Down blocks accept `add_samples` (one per resnet + one per downsampler),
  added AFTER each sub-layer and INCLUDED in the returned skip states
  (reference: unet_2d_blocks.py:1338-1398, :1459-1493).
- Up blocks accept `add_samples` and/or `capture_res`; captured states are
  taken BEFORE the additive injection (reference: :2556-2637, :2699-2764).
- `MidBlock2D` is the conv-only mid block BrushNet uses (reference: :1026).

Injection lists are consumed positionally at trace time (static Python), so
the whole UNet+BrushNet composite jits into one XLA program.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from reflecting_reality_tpu.ops.resnet import Downsample2D, ResnetBlock2D, Upsample2D
from reflecting_reality_tpu.ops.transformer import Transformer2DModel


def _pop(samples: Optional[List[jnp.ndarray]]):
    return samples.pop(0) if samples else None


class DownBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    downsample_padding: int = 1
    dtype: jnp.dtype = jnp.float32

    has_cross_attention = False

    @nn.compact
    def __call__(self, x, temb, encoder_hidden_states=None, add_samples=None):
        output_states = ()
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            a = _pop(add_samples)
            if a is not None:
                x = x + a
            output_states += (x,)
        if self.add_downsample:
            x = Downsample2D(
                self.out_channels, padding=self.downsample_padding, dtype=self.dtype,
                name="downsamplers_0",
            )(x)
            a = _pop(add_samples)
            if a is not None:
                x = x + a
            output_states += (x,)
        return x, output_states


class CrossAttnDownBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    transformer_layers_per_block: int = 1
    num_attention_heads: int = 8
    cross_attention_dim: int = 768
    add_downsample: bool = True
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    downsample_padding: int = 1
    use_linear_projection: bool = False
    ip_num_tokens: Optional[int] = None
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    has_cross_attention = True

    @nn.compact
    def __call__(self, x, temb, encoder_hidden_states=None, add_samples=None):
        output_states = ()
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            x = Transformer2DModel(
                in_channels=self.out_channels,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.out_channels // self.num_attention_heads,
                num_layers=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups,
                use_linear_projection=self.use_linear_projection,
                ip_num_tokens=self.ip_num_tokens,
                ip_scale=self.ip_scale,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, encoder_hidden_states=encoder_hidden_states)
            a = _pop(add_samples)
            if a is not None:
                x = x + a
            output_states += (x,)
        if self.add_downsample:
            x = Downsample2D(
                self.out_channels, padding=self.downsample_padding, dtype=self.dtype,
                name="downsamplers_0",
            )(x)
            a = _pop(add_samples)
            if a is not None:
                x = x + a
            output_states += (x,)
        return x, output_states


class UpBlock2D(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    has_cross_attention = False

    @nn.compact
    def __call__(
        self, x, res_hidden_states_tuple, temb, encoder_hidden_states=None,
        add_samples=None, capture_res: bool = False, upsample_size=None,
    ):
        captured = ()
        res_list = list(res_hidden_states_tuple)
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if (i == self.num_layers - 1) else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res = res_list.pop()
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            if capture_res:
                captured += (x,)
            a = _pop(add_samples)
            if a is not None:
                x = x + a
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(
                x, output_size=upsample_size
            )
            if capture_res:
                captured += (x,)
            a = _pop(add_samples)
            if a is not None:
                x = x + a
        return (x, captured) if capture_res else (x, ())


class CrossAttnUpBlock2D(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    transformer_layers_per_block: int = 1
    num_attention_heads: int = 8
    cross_attention_dim: int = 768
    add_upsample: bool = True
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    use_linear_projection: bool = False
    ip_num_tokens: Optional[int] = None
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    has_cross_attention = True

    @nn.compact
    def __call__(
        self, x, res_hidden_states_tuple, temb, encoder_hidden_states=None,
        add_samples=None, capture_res: bool = False, upsample_size=None,
    ):
        captured = ()
        res_list = list(res_hidden_states_tuple)
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if (i == self.num_layers - 1) else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res = res_list.pop()
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            x = Transformer2DModel(
                in_channels=self.out_channels,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.out_channels // self.num_attention_heads,
                num_layers=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups,
                use_linear_projection=self.use_linear_projection,
                ip_num_tokens=self.ip_num_tokens,
                ip_scale=self.ip_scale,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, encoder_hidden_states=encoder_hidden_states)
            if capture_res:
                captured += (x,)
            a = _pop(add_samples)
            if a is not None:
                x = x + a
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(
                x, output_size=upsample_size
            )
            if capture_res:
                captured += (x,)
            a = _pop(add_samples)
            if a is not None:
                x = x + a
        return (x, captured) if capture_res else (x, ())


class UNetMidBlock2DCrossAttn(nn.Module):
    in_channels: int
    num_layers: int = 1
    transformer_layers_per_block: int = 1
    num_attention_heads: int = 8
    cross_attention_dim: int = 768
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    use_linear_projection: bool = False
    ip_num_tokens: Optional[int] = None
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    has_cross_attention = True

    @nn.compact
    def __call__(self, x, temb, encoder_hidden_states=None):
        resnet = lambda i: ResnetBlock2D(
            in_channels=self.in_channels,
            out_channels=self.in_channels,
            eps=self.resnet_eps,
            groups=self.resnet_groups,
            dtype=self.dtype,
            name=f"resnets_{i}",
        )
        x = resnet(0)(x, temb)
        for i in range(self.num_layers):
            x = Transformer2DModel(
                in_channels=self.in_channels,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.in_channels // self.num_attention_heads,
                num_layers=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups,
                use_linear_projection=self.use_linear_projection,
                ip_num_tokens=self.ip_num_tokens,
                ip_scale=self.ip_scale,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, encoder_hidden_states=encoder_hidden_states)
            x = resnet(i + 1)(x, temb)
        return x


class MidBlock2D(nn.Module):
    """Conv-only mid block used by BrushNet (reference: unet_2d_blocks.py:1026)."""

    in_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-5
    resnet_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    has_cross_attention = False

    @nn.compact
    def __call__(self, x, temb, encoder_hidden_states=None):
        for i in range(self.num_layers + 1):
            x = ResnetBlock2D(
                in_channels=self.in_channels,
                out_channels=self.in_channels,
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
        return x


DOWN_BLOCKS = {"DownBlock2D": DownBlock2D, "CrossAttnDownBlock2D": CrossAttnDownBlock2D}
UP_BLOCKS = {"UpBlock2D": UpBlock2D, "CrossAttnUpBlock2D": CrossAttnUpBlock2D}
MID_BLOCKS = {"UNetMidBlock2DCrossAttn": UNetMidBlock2DCrossAttn, "MidBlock2D": MidBlock2D}
