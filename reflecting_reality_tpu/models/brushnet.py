"""BrushNetModel — the MirrorFusion conditioning branch
(reference: src/diffusers/models/brushnet.py:61).

A conv-only twin of the SD-1.5 UNet whose input is
concat(noisy latents [4ch], conditioning latents [5..13ch]) through
`conv_in_condition` (reference :221-223, :810-811).  It emits 28
zero-initialized 1x1-conv residuals for the SD-1.5 shape:

- 12 "down": conv_in output + every down resnet/downsampler state (:325-364)
-  1 "mid":  the mid block output (:369-371)
- 15 "up":   every up resnet/upsampler state, captured BEFORE injection
             would occur in a consumer (:441-449)

`conditioning_scale` multiplies all residuals; `guess_mode` applies the
logspace(-1, 0) ramp (:895-906).  `init_params_from_unet` reproduces the
`from_unet` weight surgery (:452-530): conv_in weights duplicated into input
channels 0-3 and 4-7, zeros elsewhere; time embedding copied; block resnets /
samplers copied with attention weights dropped (strict=False semantics).
"""

from __future__ import annotations

import copy
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from reflecting_reality_tpu.core.config import ConfigMixin
from reflecting_reality_tpu.models.unet_blocks import DOWN_BLOCKS, MID_BLOCKS, UP_BLOCKS
from reflecting_reality_tpu.ops.embeddings import TimestepEmbedding, get_timestep_embedding


def _zero_conv(features: int, name: str, dtype) -> nn.Conv:
    return nn.Conv(
        features, (1, 1), dtype=dtype, name=name,
        kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
    )


class BrushNetModel(nn.Module, ConfigMixin):
    in_channels: int = 4
    conditioning_channels: int = 5
    down_block_types: Tuple[str, ...] = ("DownBlock2D",) * 4
    mid_block_type: str = "MidBlock2D"
    up_block_types: Tuple[str, ...] = ("UpBlock2D",) * 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: int = 1
    downsample_padding: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 768
    attention_head_dim: int = 8
    use_linear_projection: bool = False
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    # reference brushnet.py:909-916: mean-pool all residuals over spatial
    # dims (ControlNet-style global conditioning; unused by MirrorFusion)
    global_pool_conditions: bool = False
    # SDXL variant (cloned from the SDXL unet config by config_from_unet)
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    def _heads(self) -> Tuple[int, ...]:
        h = self.attention_head_dim
        return tuple(h) if isinstance(h, (tuple, list)) else (h,) * len(self.block_out_channels)

    def dummy_inputs(self):
        """Tiny example (args, kwargs) for core.io.validate_loaded_params."""
        s = 2 ** len(self.block_out_channels)
        args = (
            jnp.zeros((1, s, s, self.in_channels), self.dtype),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, self.cross_attention_dim), self.dtype),
            jnp.zeros((1, s, s, self.conditioning_channels), self.dtype),
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
        sample: jnp.ndarray,            # (B, H, W, in_channels) noisy latents
        timesteps: jnp.ndarray,         # (B,) or scalar
        encoder_hidden_states: jnp.ndarray,
        brushnet_cond: jnp.ndarray,     # (B, H, W, conditioning_channels)
        conditioning_scale: float | jnp.ndarray = 1.0,
        guess_mode: bool = False,
        added_cond_kwargs: Optional[dict] = None,
        temb: Optional[jnp.ndarray] = None,  # precomputed time embedding
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray, List[jnp.ndarray]]:
        heads = self._heads()
        bocs = self.block_out_channels

        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # 1. time (see unet2d: `temb` = table lookup hoisted out of the scan)
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
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            t_ids = get_timestep_embedding(
                time_ids.reshape(-1), self.addition_time_embed_dim,
                flip_sin_to_cos=self.flip_sin_to_cos,
                downscale_freq_shift=self.freq_shift,
            ).reshape(text_embeds.shape[0], -1)
            aug = jnp.concatenate([text_embeds.astype(jnp.float32), t_ids], axis=-1)
            emb = emb + TimestepEmbedding(
                bocs[0] * 4, dtype=self.dtype, name="add_embedding"
            )(aug.astype(sample.dtype))

        # 2. pre-process: concat(noisy latents, conditioning) -> conv_in_condition
        x = jnp.concatenate([sample, brushnet_cond], axis=-1)
        x = nn.Conv(
            bocs[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv_in_condition",
        )(x)

        # 3. down
        down_block_res_samples = (x,)
        for i, block_type in enumerate(self.down_block_types):
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
                    transformer_layers_per_block=self.transformer_layers_per_block,
                    num_attention_heads=heads[i],
                    cross_attention_dim=self.cross_attention_dim,
                    use_linear_projection=self.use_linear_projection,
                )
            x, res_samples = block_cls(name=f"down_blocks_{i}", **kwargs)(
                x, emb, encoder_hidden_states=encoder_hidden_states
            )
            down_block_res_samples += res_samples

        # 4. zero convs over down states
        down_res = [
            _zero_conv(s.shape[-1], f"brushnet_down_blocks_{i}", self.dtype)(s)
            for i, s in enumerate(down_block_res_samples)
        ]

        # 5. mid
        mid_cls = MID_BLOCKS[self.mid_block_type]
        mid_kwargs = dict(
            in_channels=bocs[-1], resnet_eps=self.norm_eps,
            resnet_groups=self.norm_num_groups, dtype=self.dtype,
        )
        if mid_cls.has_cross_attention:
            mid_kwargs.update(
                transformer_layers_per_block=self.transformer_layers_per_block,
                num_attention_heads=heads[-1],
                cross_attention_dim=self.cross_attention_dim,
                use_linear_projection=self.use_linear_projection,
            )
        x = mid_cls(name="mid_block", **mid_kwargs)(
            x, emb, encoder_hidden_states=encoder_hidden_states
        )
        mid_res = _zero_conv(x.shape[-1], "brushnet_mid_block", self.dtype)(x)

        # 6. up (with per-layer residual capture)
        skips = list(down_block_res_samples)
        reversed_bocs = list(reversed(bocs))
        reversed_heads = list(reversed(heads))
        output_channel = reversed_bocs[0]
        up_states: Tuple[jnp.ndarray, ...] = ()
        for i, block_type in enumerate(self.up_block_types):
            is_final = i == len(bocs) - 1
            prev_output_channel = output_channel
            output_channel = reversed_bocs[i]
            input_channel = reversed_bocs[min(i + 1, len(bocs) - 1)]
            num_layers = self.layers_per_block + 1

            res_samples = tuple(skips[-num_layers:])
            skips = skips[:-num_layers]
            upsample_size = skips[-1].shape[1:3] if skips else None

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
                    transformer_layers_per_block=self.transformer_layers_per_block,
                    num_attention_heads=reversed_heads[i],
                    cross_attention_dim=self.cross_attention_dim,
                    use_linear_projection=self.use_linear_projection,
                )
            x, captured = block_cls(name=f"up_blocks_{i}", **kwargs)(
                x, res_samples, emb,
                encoder_hidden_states=encoder_hidden_states,
                capture_res=True, upsample_size=upsample_size,
            )
            up_states += captured

        up_res = [
            _zero_conv(s.shape[-1], f"brushnet_up_blocks_{i}", self.dtype)(s)
            for i, s in enumerate(up_states)
        ]

        # 7. scaling (reference brushnet.py:895-916: guess-mode logspace is
        # bypassed under global pooling, which then mean-pools every residual
        # over its spatial dims — the pooled (B, 1, 1, C) residuals broadcast
        # in the unet add-sample injections)
        if guess_mode and not self.global_pool_conditions:
            n = len(down_res) + 1 + len(up_res)
            scales = jnp.logspace(-1, 0, n) * conditioning_scale
            down_res = [s * scales[i] for i, s in enumerate(down_res)]
            mid_res = mid_res * scales[len(down_res)]
            up_res = [s * scales[len(down_res) + 1 + i] for i, s in enumerate(up_res)]
        else:
            down_res = [s * conditioning_scale for s in down_res]
            mid_res = mid_res * conditioning_scale
            up_res = [s * conditioning_scale for s in up_res]

        if self.global_pool_conditions:
            pool = lambda s: jnp.mean(s, axis=(1, 2), keepdims=True)
            down_res = [pool(s) for s in down_res]
            mid_res = pool(mid_res)
            up_res = [pool(s) for s in up_res]

        return down_res, mid_res, up_res

    @classmethod
    def config_from_unet(cls, unet, conditioning_channels: int = 5) -> dict:
        """BrushNet config cloned from a UNet config (reference :479-511):
        all blocks converted to their conv-only variants."""
        cfg = unet.to_config() if hasattr(unet, "to_config") else dict(unet)
        return dict(
            in_channels=cfg["in_channels"],
            conditioning_channels=conditioning_channels,
            down_block_types=tuple("DownBlock2D" for _ in cfg["down_block_types"]),
            mid_block_type="MidBlock2D",
            up_block_types=tuple("UpBlock2D" for _ in cfg["down_block_types"]),
            block_out_channels=tuple(cfg["block_out_channels"]),
            layers_per_block=cfg["layers_per_block"],
            transformer_layers_per_block=cfg.get("transformer_layers_per_block", 1),
            downsample_padding=cfg.get("downsample_padding", 1),
            norm_num_groups=cfg["norm_num_groups"],
            norm_eps=cfg["norm_eps"],
            cross_attention_dim=cfg["cross_attention_dim"],
            attention_head_dim=cfg["attention_head_dim"],
            use_linear_projection=cfg.get("use_linear_projection", False),
            flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
            freq_shift=cfg.get("freq_shift", 0),
            addition_embed_type=cfg.get("addition_embed_type"),
            addition_time_embed_dim=cfg.get("addition_time_embed_dim", 256),
            projection_class_embeddings_input_dim=cfg.get(
                "projection_class_embeddings_input_dim"
            ),
        )


def _tree_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def init_params_from_unet(brushnet_params: dict, unet_params: dict) -> dict:
    """Reproduce `BrushNetModel.from_unet`'s weight surgery (reference :513-528).

    - conv_in_condition kernel: unet conv_in kernel copied into input channels
      [0:4] and [4:8], zeros for the remaining conditioning channels; bias copied.
    - time_embedding copied.
    - down/mid/up blocks: copy every leaf whose path exists in both trees
      (strict=False — attention weights simply have no destination in the
      conv-only twin).
    """
    # Work entirely on host numpy: per-leaf jnp.asarray would dispatch one
    # device transfer per leaf (~300 round-trips — measured 593 s through
    # the relay at SD-1.5 scale); the jitted step transfers the whole tree
    # once at first dispatch instead.
    out = copy.deepcopy(jax.device_get(brushnet_params))
    unet_flat = dict(_tree_paths(jax.device_get(unet_params)))

    # conv_in duplication (kernels are HWIO here).
    src_kernel = np.asarray(unet_flat[("conv_in", "kernel")])
    dst_kernel = np.zeros_like(np.asarray(out["conv_in_condition"]["kernel"]))
    dst_kernel[:, :, 0:4, :] = src_kernel
    dst_kernel[:, :, 4:8, :] = src_kernel
    out["conv_in_condition"]["kernel"] = dst_kernel
    out["conv_in_condition"]["bias"] = np.asarray(unet_flat[("conv_in", "bias")])

    for path, value in _tree_paths(out):
        if path[0] == "time_embedding" or (
            path[0].startswith(("down_blocks", "mid_block", "up_blocks"))
        ):
            if path in unet_flat and np.shape(unet_flat[path]) == np.shape(value):
                node = out
                for p in path[:-1]:
                    node = node[p]
                node[path[-1]] = np.asarray(unet_flat[path])
    return out
