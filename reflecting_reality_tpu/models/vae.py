"""AutoencoderKL (reference: src/diffusers/models/autoencoders/autoencoder_kl.py:35,
vae.py:46,185,769), NHWC.

Behavioral contract:
- Encoder: conv_in -> 4 DownEncoderBlock2D (2 resnets each, no temb; stride-2
  downsample with asymmetric (0,1) padding between blocks) -> mid block
  (resnet, single-head attention with group_norm + residual, resnet) ->
  GroupNorm(32, 1e-6)+SiLU -> conv_out (2*latent channels) -> quant_conv 1x1.
- DiagonalGaussianDistribution over channel-split moments, logvar clamped to
  [-30, 20]; `sample = mean + std * noise`.
- Decoder: post_quant_conv -> conv_in -> mid -> 4 UpDecoderBlock2D (3 resnets,
  nearest x2 upsample) -> GroupNorm+SiLU -> conv_out.
- Latent scaling x0.18215 is applied by callers (pipeline/training), matching
  the reference's `vae.config.scaling_factor` usage.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from reflecting_reality_tpu.core.config import ConfigMixin
from reflecting_reality_tpu.ops.attention import Attention
from reflecting_reality_tpu.ops.norms import GroupNorm
from reflecting_reality_tpu.ops.resnet import Downsample2D, ResnetBlock2D, Upsample2D


class DiagonalGaussian(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    @property
    def std(self) -> jnp.ndarray:
        return jnp.exp(0.5 * self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        noise = jax.random.normal(rng, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + self.std * noise

    @property
    def mode(self) -> jnp.ndarray:
        return self.mean

    @classmethod
    def from_moments(cls, moments: jnp.ndarray) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return cls(mean, jnp.clip(logvar, -30.0, 20.0))


class _DownEncoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                eps=1e-6, groups=self.norm_num_groups, use_temb=False,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, None)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, padding=0, dtype=self.dtype, name="downsamplers_0")(x)
        return x


class _UpDecoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                eps=1e-6, groups=self.norm_num_groups, use_temb=False,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, None)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class _MidBlock(nn.Module):
    in_channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(
            in_channels=self.in_channels, eps=1e-6, groups=self.norm_num_groups,
            use_temb=False, dtype=self.dtype, name="resnets_0",
        )(x, None)
        x = Attention(
            query_dim=self.in_channels, heads=1, dim_head=self.in_channels,
            norm_num_groups=self.norm_num_groups, residual_connection=True,
            qkv_bias=True,  # the VAE attention carries q/k/v biases
            dtype=self.dtype, name="attentions_0",
        )(x)
        x = ResnetBlock2D(
            in_channels=self.in_channels, eps=1e-6, groups=self.norm_num_groups,
            use_temb=False, dtype=self.dtype, name="resnets_1",
        )(x, None)
        return x


class Encoder(nn.Module):
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bocs = self.block_out_channels
        x = nn.Conv(bocs[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(x)
        for i, out_ch in enumerate(bocs):
            x = _DownEncoderBlock(
                in_channels=bocs[i - 1] if i > 0 else bocs[0],
                out_channels=out_ch,
                num_layers=self.layers_per_block,
                add_downsample=i < len(bocs) - 1,
                norm_num_groups=self.norm_num_groups,
                dtype=self.dtype,
                name=f"down_blocks_{i}",
            )(x)
        x = _MidBlock(bocs[-1], norm_num_groups=self.norm_num_groups, dtype=self.dtype, name="mid_block")(x)
        x = GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(x, apply_silu=True)
        x = nn.Conv(
            2 * self.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_out",
        )(x)
        return x


class Decoder(nn.Module):
    """Split into `head` (conv_in + mid block, contains the GLOBAL attention)
    and `tail` (conv-only up blocks + norm/conv_out, finite receptive field)
    so parallel.sharded_vae can spatially shard the tail across a mesh while
    computing the head replicated at latent resolution."""

    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    out_channels: int = 3
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        reversed_bocs = list(reversed(self.block_out_channels))
        self.conv_in = nn.Conv(
            reversed_bocs[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype
        )
        self.mid_block = _MidBlock(
            reversed_bocs[0], norm_num_groups=self.norm_num_groups, dtype=self.dtype
        )
        blocks = []
        output_channel = reversed_bocs[0]
        for i in range(len(reversed_bocs)):
            prev = output_channel
            output_channel = reversed_bocs[i]
            blocks.append(
                _UpDecoderBlock(
                    in_channels=prev,
                    out_channels=output_channel,
                    num_layers=self.layers_per_block + 1,
                    add_upsample=i < len(reversed_bocs) - 1,
                    norm_num_groups=self.norm_num_groups,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )
            )
        self.up_blocks_list = blocks
        self.conv_norm_out = GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6)
        self.conv_out = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype
        )

    def head(self, z):
        return self.mid_block(self.conv_in(z))

    def tail(self, x):
        for block in self.up_blocks_list:
            x = block(x)
        x = self.conv_norm_out(x, apply_silu=True)
        return self.conv_out(x)

    def __call__(self, z):
        return self.tail(self.head(z))


class AutoencoderKL(nn.Module, ConfigMixin):
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    sample_size: int = 512
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            latent_channels=self.latent_channels,
            norm_num_groups=self.norm_num_groups,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            latent_channels=self.latent_channels,
            out_channels=self.out_channels,
            norm_num_groups=self.norm_num_groups,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype)

    def encode(self, x: jnp.ndarray) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussian.from_moments(moments)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        posterior = self.encode(x)
        z = posterior.sample(rng)
        return self.decode(z)

    def dummy_inputs(self):
        """Tiny example (args, kwargs) for core.io.validate_loaded_params."""
        s = 2 ** len(self.block_out_channels)
        return (jnp.zeros((1, s, s, self.in_channels), self.dtype),
                jax.random.PRNGKey(0)), {}
