"""StableDiffusionXLBrushNetPipeline, TPU-native (reference:
src/diffusers/pipelines/brushnet/pipeline_brushnet_sd_xl.py — present in the
reference but unused by the MirrorFusion scripts; rebuilt for inventory
parity).

SDXL deltas vs the SD-1.5 pipeline (same jitted-scan architecture):
- dual text encoders: prompt_embeds = concat(encoder1.hidden[-2],
  encoder2.hidden[-2]) (768+1280=2048); pooled projection from encoder 2.
- micro-conditioning: add_time_ids = (orig_h, orig_w, crop_top, crop_left,
  target_h, target_w) fed with the pooled embeds through the unet's
  text_time addition embedding (added_cond_kwargs).
- vae scaling_factor 0.13025; default resolution 1024 (use
  enable_vae_tiling for decode memory).
Conditioning-latent assembly (masked latents + mask + depth/normals modes)
and brushnet_keep windowing are identical to the SD-1.5 pipeline.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from reflecting_reality_tpu.pipelines.brushnet_pipeline import StableDiffusionBrushNetPipeline
from reflecting_reality_tpu.schedulers.common import NoiseSchedule, ddim_timesteps
from reflecting_reality_tpu.schedulers.ddim import ddim_step
from reflecting_reality_tpu.schedulers.unipc import UniPCSampler


class StableDiffusionXLBrushNetPipeline(StableDiffusionBrushNetPipeline):
    def __init__(
        self,
        vae,
        text_encoder,            # (CLIPTextModel, params) — OpenAI CLIP-L
        text_encoder_2,          # (CLIPTextModelWithProjection, params) — bigG
        tokenizer,
        tokenizer_2,
        unet,
        brushnet,
        schedule: Optional[NoiseSchedule] = None,
        depth_conditioning_mode: Optional[str] = None,
        normals_conditioning_mode: Optional[str] = None,
        vae_scale_factor: int = 8,
        scaling_factor: float = 0.13025,
        force_zeros_for_empty_prompt: bool = True,
        dtype: jnp.dtype = jnp.float32,
    ):
        self.force_zeros_for_empty_prompt = force_zeros_for_empty_prompt
        super().__init__(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            unet=unet, brushnet=brushnet, schedule=schedule,
            depth_conditioning_mode=depth_conditioning_mode,
            normals_conditioning_mode=normals_conditioning_mode,
            vae_scale_factor=vae_scale_factor, scaling_factor=scaling_factor,
            dtype=dtype,
        )
        self.text_module_2, self.text_params_2 = text_encoder_2
        self.tokenizer_2 = tokenizer_2

    # -------------------------------------------------------------- prompts

    @functools.cached_property
    def _text_apply_hidden(self):
        return jax.jit(lambda p, ids: self.text_module.apply(
            p, ids, output_hidden_states=True))

    @functools.cached_property
    def _text2_apply_hidden(self):
        return jax.jit(lambda p, ids: self.text_module_2.apply(
            p, ids, output_hidden_states=True))

    def encode_prompt_xl(
        self,
        prompt: Union[str, Sequence[str]],
        negative_prompt: Union[str, Sequence[str], None] = None,
        do_classifier_free_guidance: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (prompt_embeds (2B,T,2048), pooled (2B,1280)); CFG layout
        [negative..., positive...] (reference sdxl encode_prompt)."""
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        negatives = (
            [""] * len(prompts) if negative_prompt is None
            else ([negative_prompt] * len(prompts) if isinstance(negative_prompt, str)
                  else list(negative_prompt))
        )

        def encode(texts):
            # device-side memo shared with the base pipeline's policy
            # (see brushnet_pipeline.encode_prompt): repeated prompts and
            # the CFG uncond batch skip both tokenizers + both encoders
            key = ("xl", tuple(texts))
            out = self._prompt_cache.get(key)
            if out is not None:
                return out
            ids1 = jnp.asarray(self.tokenizer(texts), jnp.int32)
            ids2 = jnp.asarray(self.tokenizer_2(texts), jnp.int32)
            _, h1 = self._text_apply_hidden(self.text_params, ids1)
            _, pooled, h2 = self._text2_apply_hidden(self.text_params_2, ids2)
            # penultimate hidden states (clip-skip fixed at 2 for SDXL)
            emb = jnp.concatenate([h1[-2], h2[-2]], axis=-1)
            if len(self._prompt_cache) < 256:
                self._prompt_cache[key] = (emb, pooled)
            return emb, pooled

        pos, pos_pool = encode(prompts)
        if not do_classifier_free_guidance:
            return pos, pos_pool
        if negative_prompt is None and self.force_zeros_for_empty_prompt:
            # SDXL contract: unset negative prompt -> ZERO embeds, not the
            # encoded empty string (reference pipeline_brushnet_sd_xl
            # force_zeros_for_empty_prompt=True default)
            neg, neg_pool = jnp.zeros_like(pos), jnp.zeros_like(pos_pool)
        else:
            neg, neg_pool = encode(negatives)
        return (jnp.concatenate([neg, pos], 0),
                jnp.concatenate([neg_pool, pos_pool], 0))

    # --------------------------------------------------------------- sampler

    def _get_sampler_fn(self, key):
        if key in self._jit_cache:
            return self._jit_cache[key]
        (b, hl, wl, cl), steps, scheduler_name, do_cfg, guess_mode = key[:5]
        if guess_mode:
            raise ValueError("guess_mode is handled by the SD-1.5 path only")
        deep_cache = self._deep_cache
        encoder_reuse = self._encoder_reuse
        if deep_cache and encoder_reuse:
            raise ValueError("deep_cache and encoder_reuse are mutually exclusive")

        if scheduler_name == "unipc":
            sampler = UniPCSampler(self.schedule, steps)
            timesteps = sampler.timesteps
        elif scheduler_name == "ddim":
            timesteps = jnp.asarray(
                ddim_timesteps(self.schedule.num_train_timesteps, steps), jnp.int32
            )
            sampler = None
        else:
            raise ValueError(scheduler_name)

        unet_apply = self.unet_module.apply
        brushnet_apply = self.brushnet_module.apply
        decode_fn = self._make_decode_fn()

        def run(unet_params, brushnet_params, vae_params, latents, cond,
                prompt_embeds, added, keep):
            cond_b = jnp.concatenate([cond, cond], 0) if do_cfg else cond
            # No BrushNet CFG dedup here: SDXL's text_time addition embedding
            # differs between the CFG halves (pooled embeds), so the conv-only
            # branch does NOT see identical inputs (cf. SD-1.5 dedup note).

            def branch_forward(latents, t, cond_scale):
                """Full dual branch; returns (pred, deep-cache tuple)."""
                latent_in = jnp.concatenate([latents, latents], 0) if do_cfg else latents
                down, mid, up = brushnet_apply(
                    brushnet_params, latent_in.astype(self.dtype), t,
                    prompt_embeds.astype(self.dtype), cond_b.astype(self.dtype),
                    conditioning_scale=cond_scale,
                    added_cond_kwargs=added,
                )
                out = unet_apply(
                    unet_params, latent_in.astype(self.dtype), t,
                    prompt_embeds.astype(self.dtype),
                    down_block_add_samples=down, mid_block_add_sample=mid,
                    up_block_add_samples=up,
                    added_cond_kwargs=added,
                    return_deep=deep_cache is not None,
                )
                if deep_cache is not None:
                    pred, deep = out
                    return pred, (deep, tuple(down), mid, tuple(up))
                return out, None

            def shallow_forward(latents, t, cache):
                """DeepCache step: cached trunk + cached residual stacks."""
                deep, down, mid, up = cache
                latent_in = jnp.concatenate([latents, latents], 0) if do_cfg else latents
                pred, _ = unet_apply(
                    unet_params, latent_in.astype(self.dtype), t,
                    prompt_embeds.astype(self.dtype),
                    down_block_add_samples=list(down),
                    mid_block_add_sample=mid,
                    up_block_add_samples=list(up),
                    added_cond_kwargs=added,
                    cached_deep=deep,
                )
                return pred, cache

            def er_full(latents, t, cond_scale):
                latent_in = jnp.concatenate([latents, latents], 0) if do_cfg else latents
                down, mid, up = brushnet_apply(
                    brushnet_params, latent_in.astype(self.dtype), t,
                    prompt_embeds.astype(self.dtype), cond_b.astype(self.dtype),
                    conditioning_scale=cond_scale,
                    added_cond_kwargs=added,
                )
                pred, enc = unet_apply(
                    unet_params, latent_in.astype(self.dtype), t,
                    prompt_embeds.astype(self.dtype),
                    down_block_add_samples=down, mid_block_add_sample=mid,
                    up_block_add_samples=up,
                    added_cond_kwargs=added,
                    return_encoder=True,
                )
                return pred, (enc, mid, tuple(up))

            def er_reuse(latents, t, cache):
                enc, mid, up = cache
                latent_in = jnp.concatenate([latents, latents], 0) if do_cfg else latents
                pred, _ = unet_apply(
                    unet_params, latent_in.astype(self.dtype), t,
                    prompt_embeds.astype(self.dtype),
                    mid_block_add_sample=mid,
                    up_block_add_samples=list(up),
                    added_cond_kwargs=added,
                    cached_encoder=enc,
                    return_encoder=True,
                )
                return pred, cache

            def model_eval(latents, t, cond_scale, i, cache):
                if deep_cache is not None:
                    pred, cache = jax.lax.cond(
                        i % deep_cache == 0,
                        lambda lat, tt, cs, c: branch_forward(lat, tt, cs),
                        lambda lat, tt, cs, c: shallow_forward(lat, tt, c),
                        latents, t, cond_scale, cache,
                    )
                elif encoder_reuse is not None:
                    pred, cache = jax.lax.cond(
                        i % encoder_reuse == 0,
                        lambda lat, tt, cs, c: er_full(lat, tt, cs),
                        lambda lat, tt, cs, c: er_reuse(lat, tt, c),
                        latents, t, cond_scale, cache,
                    )
                else:
                    pred, cache = branch_forward(latents, t, cond_scale)
                if do_cfg:
                    u, c = jnp.split(pred, 2, 0)
                    pred = u + keep["guidance_scale"] * (c - u)
                return pred, cache

            cache0 = None
            if deep_cache is not None or encoder_reuse is not None:
                full_fn = branch_forward if deep_cache is not None else er_full
                shapes = jax.eval_shape(
                    lambda lat: full_fn(lat, timesteps[0], keep["cond_scale"][0])[1],
                    latents,
                )
                cache0 = jax.tree_util.tree_map(
                    lambda sh: jnp.zeros(sh.shape, sh.dtype), shapes
                )

            if scheduler_name == "unipc":
                state0 = sampler.init_state(latents)

                def body(carry, xs):
                    lat, st, cache = carry
                    i, t, k = xs
                    pred, cache = model_eval(lat, t, k, i, cache)
                    lat, st = sampler.step(pred, i, lat, st)
                    return (lat, st, cache), None

                (latents, _, _), _ = jax.lax.scan(
                    body, (latents, state0, cache0),
                    (jnp.arange(steps), timesteps, keep["cond_scale"]),
                )
            else:
                prev = jnp.concatenate([timesteps[1:], jnp.full((1,), -1, jnp.int32)])

                def body(carry, xs):
                    lat, cache = carry
                    i, t, tp, k = xs
                    pred, cache = model_eval(lat, t, k, i, cache)
                    return (ddim_step(self.schedule, pred, t, tp, lat), cache), None

                (latents, _), _ = jax.lax.scan(
                    body, (latents, cache0),
                    (jnp.arange(steps), timesteps, prev, keep["cond_scale"]),
                )

            # decode honoring the active toggles (sharded > tiled > plain);
            # same dispatch as the SD-1.5 path (base _make_decode_fn)
            return decode_fn(vae_params, latents)

        # _trace_ctx: no-op unless enable_int8 quantized the unet/brushnet
        # trees (base-class W8A8 serving mode works unchanged for SDXL)
        fn = jax.jit(self._trace_ctx(run))
        self._jit_cache[key] = fn
        return fn

    # ----------------------------------------------------------------- call

    def __call__(
        self,
        prompt,
        image,
        mask,
        depth=None,
        normals=None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt=None,
        num_images_per_prompt: int = 1,
        seed: Optional[int] = None,
        brushnet_conditioning_scale: float = 1.0,
        control_guidance_start: float = 0.0,
        control_guidance_end: float = 1.0,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        scheduler: str = "unipc",
        latents: Optional[jnp.ndarray] = None,
        deterministic_vae_encode: bool = False,
        output_type: str = "np",
    ):
        do_cfg = guidance_scale > 1.0
        rng = jax.random.PRNGKey(0 if seed is None else seed)
        rng_noise, rng_vae = jax.random.split(rng)

        prompt_embeds, pooled = self.encode_prompt_xl(prompt, negative_prompt, do_cfg)
        if num_images_per_prompt > 1:
            # repeat WITHIN each CFG half so the [neg..., pos...] layout holds
            halves = jnp.split(prompt_embeds, 2, 0) if do_cfg else [prompt_embeds]
            prompt_embeds = jnp.concatenate(
                [jnp.repeat(h, num_images_per_prompt, axis=0) for h in halves], 0)
            phalves = jnp.split(pooled, 2, 0) if do_cfg else [pooled]
            pooled = jnp.concatenate(
                [jnp.repeat(h, num_images_per_prompt, axis=0) for h in phalves], 0)

        image_np = self.image_processor.preprocess(image, height, width)
        mask_np = self.image_processor.preprocess(mask, height, width)
        h, w = image_np.shape[1:3]
        mask_np = (mask_np.sum(-1, keepdims=True) < 0).astype(np.float32)
        hl, wl = h // self.vae_scale_factor, w // self.vae_scale_factor

        # ONE packed host->device upload (image+depth+mask), device-side
        # latent-res downsamples — same transfer policy as the SD-1.5
        # pipeline (see brushnet_pipeline.__call__ step 3)
        parts = [image_np]
        if self.depth_conditioning_mode == "concat":
            parts.append(self.image_processor.preprocess(depth, h, w)[..., :1])
        parts.append(mask_np)
        packed = jnp.asarray(np.concatenate(parts, axis=-1))
        rows = (np.arange(hl) * h // hl).astype(np.int32)
        cols = (np.arange(wl) * w // wl).astype(np.int32)

        def down(a):  # interpolate_nearest's indices, applied on device
            return a[:, rows][:, :, cols]

        if deterministic_vae_encode:
            cond = self._encode_mode(self.vae_params, packed[..., :3])
        else:
            cond = self._encode_sample(self.vae_params, packed[..., :3], rng_vae)
        cond = jnp.concatenate(
            [cond, down(packed[..., -1:]).astype(cond.dtype)], -1)
        if self.depth_conditioning_mode == "concat":
            cond = jnp.concatenate(
                [cond, down(packed[..., 3:4]).astype(cond.dtype)], -1)

        batch = image_np.shape[0] * num_images_per_prompt
        if num_images_per_prompt > 1:
            cond = jnp.repeat(cond, num_images_per_prompt, axis=0)
        if latents is None:
            latents = jax.random.normal(rng_noise, (batch, hl, wl, 4), jnp.float32)

        original_size = original_size or (h, w)
        target_size = target_size or (h, w)
        add_time_ids = jnp.asarray(
            [list(original_size) + list(crops_coords_top_left) + list(target_size)],
            jnp.float32,
        )
        n = pooled.shape[0]
        added = {
            "text_embeds": pooled,
            "time_ids": jnp.tile(add_time_ids, (n, 1)),
        }

        keeps = np.array(
            [
                1.0 - float(i / num_inference_steps < control_guidance_start
                            or (i + 1) / num_inference_steps > control_guidance_end)
                for i in range(num_inference_steps)
            ],
            np.float32,
        )
        keep_scales = {"cond_scale": jnp.asarray(keeps * brushnet_conditioning_scale),
                       "guidance_scale": jnp.float32(guidance_scale)}
        if self._dp_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            mesh, axis = self._dp_mesh
            n = mesh.devices.size
            if batch % n:
                raise ValueError(
                    f"data-parallel generation needs batch_size ({batch}) "
                    f"divisible by the mesh size ({n}); use "
                    "num_images_per_prompt or a prompt list to fill the mesh"
                )
            shard_b = NamedSharding(mesh, PartitionSpec(axis))
            repl = NamedSharding(mesh, PartitionSpec())
            latents = jax.device_put(latents, shard_b)
            cond = jax.device_put(cond, shard_b)
            prompt_embeds = jax.device_put(prompt_embeds, shard_b)
            added = jax.device_put(added, shard_b)
            keep_scales = jax.device_put(keep_scales, repl)
        key = ((batch, hl, wl, 4), num_inference_steps, scheduler, do_cfg, False,
               self._deep_cache, self._encoder_reuse)
        fn = self._get_sampler_fn(key)
        out = fn(
            self.unet_params, self.brushnet_params, self.vae_params,
            latents, cond, prompt_embeds, added, keep_scales,
        )
        if output_type == "latent":
            return np.asarray(out)
        out = self._to_uint8(out)  # device-side uint8: 4x fewer fetched bytes
        if output_type == "device":
            return out  # async un-fetched uint8 (see brushnet_pipeline.__call__)
        return self.image_processor.postprocess(np.asarray(out), output_type=output_type)
