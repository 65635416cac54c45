"""UNet2DConditionModel (reference: src/diffusers/models/unets/unet_2d_condition.py:69)
with the BrushNet additive-injection extensions (:1054-1056, :1217, :1288, :1303).

NHWC throughout.  `down_block_add_samples` / `mid_block_add_sample` /
`up_block_add_samples` take the BrushNet residual stacks (12 / 1 / 15 tensors
for the SD-1.5 shape) and add them at the exact positions the reference does:
after conv_in, after every down resnet(+attn) and downsampler (included in the
skip states), after the mid block, and after every up resnet(+attn) and
upsampler.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from reflecting_reality_tpu.core.config import ConfigMixin
from reflecting_reality_tpu.models.unet_blocks import DOWN_BLOCKS, MID_BLOCKS, UP_BLOCKS
from reflecting_reality_tpu.ops.embeddings import TimestepEmbedding, get_timestep_embedding
from reflecting_reality_tpu.ops.norms import GroupNorm


class UNet2DConditionModel(nn.Module, ConfigMixin):
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D",
    )
    mid_block_type: str = "UNetMidBlock2DCrossAttn"
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # int or per-block tuple (SDXL: (1, 2, 10))
    transformer_layers_per_block: int | Tuple[int, ...] = 1
    downsample_padding: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 768
    attention_head_dim: int = 8  # SD-1.5 naming quirk: this is the head COUNT
    use_linear_projection: bool = False
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    # IP-Adapter (normals conditioning): when set, every cross-attention
    # layer treats the LAST ip_num_tokens of encoder_hidden_states as the
    # decoupled image/normal tokens (reference train_brushnet_mirror.py:1085-1123).
    ip_num_tokens: Optional[int] = None
    ip_scale: float = 1.0
    # SDXL micro-conditioning: addition_embed_type="text_time" adds
    # TimestepEmbedding(concat(pooled text embeds, sin(time_ids))) to temb
    # (reference unet_2d_condition.py addition_embed_type handling).
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    def _tlayers(self) -> Tuple[int, ...]:
        t = self.transformer_layers_per_block
        return tuple(t) if isinstance(t, (tuple, list)) else (t,) * len(self.block_out_channels)

    def _heads(self) -> Tuple[int, ...]:
        # diffusers' historical naming bug: SD-1.5's `attention_head_dim=8`
        # is the number of heads (reference: models/brushnet.py:186-192).
        h = self.attention_head_dim
        return tuple(h) if isinstance(h, (tuple, list)) else (h,) * len(self.block_out_channels)

    def dummy_inputs(self):
        """Tiny example (args, kwargs) whose init covers every param —
        used by core.io.validate_loaded_params via jax.eval_shape."""
        s = 2 ** len(self.block_out_channels)
        args = (
            jnp.zeros((1, s, s, self.in_channels), self.dtype),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, self.cross_attention_dim), self.dtype),
        )
        kwargs = {}
        if self.addition_embed_type == "text_time":
            text_dim = (self.projection_class_embeddings_input_dim
                        - 6 * self.addition_time_embed_dim)
            kwargs["added_cond_kwargs"] = {
                "text_embeds": jnp.zeros((1, text_dim), self.dtype),
                "time_ids": jnp.zeros((1, 6), jnp.int32),
            }
        return args, kwargs

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,          # (B, H, W, in_channels)
        timesteps: jnp.ndarray,       # (B,) or scalar
        encoder_hidden_states: jnp.ndarray,  # (B, T, cross_attention_dim)
        down_block_add_samples: Optional[Sequence[jnp.ndarray]] = None,
        mid_block_add_sample: Optional[jnp.ndarray] = None,
        up_block_add_samples: Optional[Sequence[jnp.ndarray]] = None,
        added_cond_kwargs: Optional[dict] = None,
        cached_deep: Optional[jnp.ndarray] = None,
        return_deep: bool = False,
        cached_encoder: Optional[tuple] = None,
        return_encoder: bool = False,
        temb: Optional[jnp.ndarray] = None,  # precomputed time embedding (B, 4*bocs[0])
    ):
        """DeepCache support (opt-in inference acceleration, after
        arXiv:2312.03209): `return_deep=True` additionally returns the hidden
        state entering the LAST up block (the "deep trunk" output); passing it
        back as `cached_deep` on a later step skips down blocks 1..N, the mid
        block, and up blocks 0..N-2, recomputing only the shallow
        (highest-resolution) encoder/decoder around it.

        Encoder reuse ("Faster Diffusion", arXiv:2312.09608):
        `return_encoder=True` additionally returns `(sample_before_mid,
        down_block_res_samples)` — the encoder output + skip stack (with any
        brushnet down residuals already applied); passing it back as
        `cached_encoder` on a later step skips conv_in + ALL down blocks and
        recomputes only mid + decoder with the current timestep.  A milder
        approximation than DeepCache (the full decoder still runs each step)."""
        heads = self._heads()
        tlayers = self._tlayers()
        bocs = self.block_out_channels
        # brushnet injections are gated per-kind: encoder-reuse steps pass
        # mid/up residuals with down_block_add_samples=None (the down
        # residuals are baked into the cached skip stack).
        is_brushnet = up_block_add_samples is not None

        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # 1. time — `temb` lets samplers hoist the timestep MLP out of the
        # denoise scan: ops.embeddings.precompute_time_embeddings batches the
        # sinusoid + 2 GEMMs over all N steps once, and the scan indexes the
        # table (fused time-embedding GEMMs, PROFILE.md candidate).
        if temb is not None:
            emb = jnp.broadcast_to(
                temb.astype(self.dtype), (sample.shape[0], temb.shape[-1])
            )
        else:
            t_emb = get_timestep_embedding(
                timesteps, bocs[0], flip_sin_to_cos=self.flip_sin_to_cos,
                downscale_freq_shift=self.freq_shift,
            ).astype(sample.dtype)
            emb = TimestepEmbedding(bocs[0] * 4, dtype=self.dtype, name="time_embedding")(t_emb)

        if self.addition_embed_type == "text_time":
            assert added_cond_kwargs is not None, "text_time needs added_cond_kwargs"
            text_embeds = added_cond_kwargs["text_embeds"]     # (B, pooled_dim)
            time_ids = added_cond_kwargs["time_ids"]           # (B, 6)
            t_ids = get_timestep_embedding(
                time_ids.reshape(-1), self.addition_time_embed_dim,
                flip_sin_to_cos=self.flip_sin_to_cos,
                downscale_freq_shift=self.freq_shift,
            ).reshape(text_embeds.shape[0], -1)
            aug = jnp.concatenate([text_embeds.astype(jnp.float32), t_ids], axis=-1)
            emb = emb + TimestepEmbedding(
                bocs[0] * 4, dtype=self.dtype, name="add_embedding"
            )(aug.astype(sample.dtype))

        has_down_adds = down_block_add_samples is not None
        up_adds = list(up_block_add_samples) if is_brushnet else None
        shallow_only = cached_deep is not None
        assert not (shallow_only and cached_encoder is not None)

        if cached_encoder is not None:
            # encoder reuse: skip conv_in + down blocks entirely; the cached
            # skip stack already contains any brushnet down residuals.
            sample, down_block_res_samples = cached_encoder
            down_block_res_samples = tuple(down_block_res_samples)
        else:
            # 2. pre-process
            sample = nn.Conv(
                bocs[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in"
            )(sample)

            down_adds = list(down_block_add_samples) if has_down_adds else None

            down_block_res_samples = (sample,)
            if has_down_adds:
                sample = sample + down_adds.pop(0)

            # 3. down
            for i, block_type in enumerate(self.down_block_types):
                if shallow_only and i > 0:
                    break
                is_final = i == len(bocs) - 1
                block_cls = DOWN_BLOCKS[block_type]
                kwargs = dict(
                    in_channels=bocs[i - 1] if i > 0 else bocs[0],
                    out_channels=bocs[i],
                    num_layers=self.layers_per_block,
                    add_downsample=not is_final,
                    resnet_eps=self.norm_eps,
                    resnet_groups=self.norm_num_groups,
                    downsample_padding=self.downsample_padding,
                    dtype=self.dtype,
                )
                if block_cls.has_cross_attention:
                    kwargs.update(
                        transformer_layers_per_block=tlayers[i],
                        num_attention_heads=heads[i],
                        cross_attention_dim=self.cross_attention_dim,
                        use_linear_projection=self.use_linear_projection,
                        ip_num_tokens=self.ip_num_tokens,
                        ip_scale=self.ip_scale,
                    )
                n_take = self.layers_per_block + (0 if is_final else 1)
                adds = [down_adds.pop(0) for _ in range(n_take)] if has_down_adds else None
                sample, res_samples = block_cls(name=f"down_blocks_{i}", **kwargs)(
                    sample, emb, encoder_hidden_states=encoder_hidden_states, add_samples=adds
                )
                down_block_res_samples += res_samples

        encoder_cache = (sample, tuple(down_block_res_samples))

        if shallow_only:
            # shallow decoder only: final up block over the cached deep trunk
            num_layers = self.layers_per_block + 1
            res_samples = tuple(down_block_res_samples[:num_layers])
            i = len(self.up_block_types) - 1
            block_cls = UP_BLOCKS[self.up_block_types[i]]
            kwargs = dict(
                in_channels=bocs[0],
                prev_output_channel=bocs[1] if len(bocs) > 1 else bocs[0],
                out_channels=bocs[0],
                num_layers=num_layers,
                add_upsample=False,
                resnet_eps=self.norm_eps,
                resnet_groups=self.norm_num_groups,
                dtype=self.dtype,
            )
            if block_cls.has_cross_attention:
                kwargs.update(
                    transformer_layers_per_block=tlayers[0],
                    num_attention_heads=heads[0],
                    cross_attention_dim=self.cross_attention_dim,
                    use_linear_projection=self.use_linear_projection,
                    ip_num_tokens=self.ip_num_tokens,
                    ip_scale=self.ip_scale,
                )
            adds = list(up_adds[-num_layers:]) if is_brushnet else None
            sample, _ = block_cls(name=f"up_blocks_{i}", **kwargs)(
                cached_deep, res_samples, emb,
                encoder_hidden_states=encoder_hidden_states,
                add_samples=adds, upsample_size=None,
            )
            sample = GroupNorm(
                num_groups=self.norm_num_groups, epsilon=self.norm_eps,
                name="conv_norm_out",
            )(sample, apply_silu=True)
            sample = nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name="conv_out",
            )(sample)
            return sample, cached_deep

        # 4. mid
        mid_cls = MID_BLOCKS[self.mid_block_type]
        mid_kwargs = dict(
            in_channels=bocs[-1], resnet_eps=self.norm_eps,
            resnet_groups=self.norm_num_groups, dtype=self.dtype,
        )
        if mid_cls.has_cross_attention:
            mid_kwargs.update(
                transformer_layers_per_block=tlayers[-1],
                num_attention_heads=heads[-1],
                cross_attention_dim=self.cross_attention_dim,
                use_linear_projection=self.use_linear_projection,
                ip_num_tokens=self.ip_num_tokens,
                ip_scale=self.ip_scale,
            )
        sample = mid_cls(name="mid_block", **mid_kwargs)(
            sample, emb, encoder_hidden_states=encoder_hidden_states
        )
        if mid_block_add_sample is not None:
            sample = sample + mid_block_add_sample

        # 5. up
        down_block_res_samples = list(down_block_res_samples)
        reversed_bocs = list(reversed(bocs))
        reversed_heads = list(reversed(heads))
        output_channel = reversed_bocs[0]
        deep = None
        for i, block_type in enumerate(self.up_block_types):
            is_final = i == len(bocs) - 1
            if is_final:
                deep = sample  # input to the last up block (DeepCache point)
            prev_output_channel = output_channel
            output_channel = reversed_bocs[i]
            input_channel = reversed_bocs[min(i + 1, len(bocs) - 1)]
            num_layers = self.layers_per_block + 1

            res_samples = tuple(down_block_res_samples[-num_layers:])
            down_block_res_samples = down_block_res_samples[:-num_layers]
            upsample_size = (
                down_block_res_samples[-1].shape[1:3] if down_block_res_samples else None
            )

            block_cls = UP_BLOCKS[block_type]
            kwargs = dict(
                in_channels=input_channel,
                prev_output_channel=prev_output_channel,
                out_channels=output_channel,
                num_layers=num_layers,
                add_upsample=not is_final,
                resnet_eps=self.norm_eps,
                resnet_groups=self.norm_num_groups,
                dtype=self.dtype,
            )
            if block_cls.has_cross_attention:
                kwargs.update(
                    transformer_layers_per_block=list(reversed(tlayers))[i],
                    num_attention_heads=reversed_heads[i],
                    cross_attention_dim=self.cross_attention_dim,
                    use_linear_projection=self.use_linear_projection,
                    ip_num_tokens=self.ip_num_tokens,
                    ip_scale=self.ip_scale,
                )
            n_take = num_layers + (0 if is_final else 1)
            adds = [up_adds.pop(0) for _ in range(n_take)] if is_brushnet else None
            sample, _ = block_cls(name=f"up_blocks_{i}", **kwargs)(
                sample, res_samples, emb,
                encoder_hidden_states=encoder_hidden_states,
                add_samples=adds, upsample_size=upsample_size,
            )

        # 6. post-process
        sample = GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.norm_eps, name="conv_norm_out"
        )(sample, apply_silu=True)
        sample = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out"
        )(sample)
        if return_deep:
            return sample, deep
        if return_encoder:
            return sample, encoder_cache
        return sample
