"""SD-inpainting baseline (reference: baseline/sd_inpainting/
{train,test}_sdinpainting.py — the 9-channel UNet fine-tune MirrorFusion is
compared against).

Differences from the BrushNet path, kept exactly:
- No conditioning branch: the UNet input is
  concat(noisy latents[4], mask[1], masked latents[4], depth?, normals?)
  — note the MASK-FIRST order inside the conditioning block
  (train_sdinpainting.py:1140 "note the concat order as per the pipeline").
- `inflate_conv_in_params` reproduces the conv_in surgery (:853-882):
  pretrained weights preserved in the first 4 (or 9) input channels, extra
  channels zero-initialized.
- The WHOLE UNet trains.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from reflecting_reality_tpu.schedulers.common import (
    NoiseSchedule, add_noise, compute_snr, get_velocity,
)
from reflecting_reality_tpu.training.train_step import (
    TrainConfig, make_optimizer, nearest_resize_nhwc,
)


def baseline_in_channels(depth_mode: Optional[str], normals_mode: Optional[str]) -> int:
    """4 latents + 1 mask + 4 masked latents + conditioning extras
    (reference :826-851)."""
    ch = 9
    ch += {"concat": 1, "latents": 4, None: 0}[depth_mode]
    ch += {"concat": 3, "latents": 4, None: 0}[normals_mode]
    return ch


def inflate_conv_in_params(unet_params: dict, new_kernel_shape, preserve: int = 4) -> dict:
    """Zero-extended conv_in kernel with the pretrained first `preserve`
    input channels copied (reference :859-866 / :875-882).  HWIO kernels."""
    import copy

    out = copy.deepcopy(unet_params)
    old = np.asarray(out["conv_in"]["kernel"])
    new = np.zeros(new_kernel_shape, old.dtype)
    new[:, :, :preserve, :] = old[:, :, :preserve, :]
    out["conv_in"]["kernel"] = jnp.asarray(new)
    return out


def assemble_baseline_input(vae_module, vae_params, batch, noisy_latents, rng,
                            config: TrainConfig, dtype=jnp.float32) -> jnp.ndarray:
    """concat(noisy, mask, masked-latents, depth?, normals?) at latent res."""
    r1, r2, r3 = jax.random.split(rng, 3)
    enc = lambda img, r: vae_module.apply(
        vae_params, img.astype(dtype), method=vae_module.encode
    ).sample(r) * config.scaling_factor

    cond = enc(batch["conditioning_pixel_values"], r1)
    hl, wl = cond.shape[1:3]
    mask = nearest_resize_nhwc(batch["masks"], hl, wl)
    cond = jnp.concatenate([mask.astype(cond.dtype), cond], axis=-1)  # mask FIRST

    if config.depth_conditioning_mode == "concat":
        d = nearest_resize_nhwc(batch["depths"], hl, wl)
        cond = jnp.concatenate([cond, d.astype(cond.dtype)], axis=-1)
    elif config.depth_conditioning_mode == "latents":
        cond = jnp.concatenate([cond, enc(jnp.repeat(batch["depths"], 3, -1), r2)], axis=-1)
    if config.normals_conditioning_mode == "concat":
        n = nearest_resize_nhwc(batch["normals"], hl, wl)
        cond = jnp.concatenate([cond, n.astype(cond.dtype)], axis=-1)
    elif config.normals_conditioning_mode == "latents":
        cond = jnp.concatenate([cond, enc(batch["normals"], r3)], axis=-1)

    return jnp.concatenate([noisy_latents.astype(cond.dtype), cond], axis=-1)


class BaselineTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    unet: Dict[str, Any]
    frozen: Dict[str, Any]
    opt_state: Any


def make_baseline_train_step(unet, vae, text_encoder, config: TrainConfig,
                             dtype=jnp.float32):
    noise_schedule = NoiseSchedule.create(
        num_train_timesteps=config.num_train_timesteps,
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        prediction_type=config.prediction_type,
    )
    tx, _ = make_optimizer(config)

    def init_state(unet_params, vae_params, text_params) -> BaselineTrainState:
        return BaselineTrainState(
            step=jnp.zeros((), jnp.int32),
            unet=unet_params,
            frozen={"vae": vae_params, "text": text_params},
            opt_state=tx.init(unet_params),
        )

    def loss_fn(unet_params, frozen, batch, rng):
        r_lat, r_cond, r_noise, r_t = jax.random.split(rng, 4)
        latents = vae.apply(
            frozen["vae"], batch["pixel_values"].astype(dtype), method=vae.encode
        ).sample(r_lat) * config.scaling_factor
        latents = jax.lax.stop_gradient(latents)

        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        timesteps = jax.random.randint(
            r_t, (latents.shape[0],), 0, config.num_train_timesteps, jnp.int32
        )
        noisy = add_noise(noise_schedule, latents, noise, timesteps)
        combined = jax.lax.stop_gradient(
            assemble_baseline_input(vae, frozen["vae"], batch, noisy, r_cond,
                                    config, dtype)
        )
        ehs = jax.lax.stop_gradient(
            text_encoder.apply(frozen["text"], batch["input_ids"])
        )
        pred = unet.apply(unet_params, combined.astype(dtype), timesteps,
                          ehs.astype(dtype))

        if config.prediction_type == "epsilon":
            target = noise
        else:
            target = get_velocity(noise_schedule, latents, noise, timesteps)
        err = (pred.astype(jnp.float32) - target) ** 2
        if config.snr_gamma is None:
            return jnp.mean(err)
        snr = compute_snr(noise_schedule, timesteps)
        w = jnp.minimum(snr, config.snr_gamma)
        w = w / snr if config.prediction_type == "epsilon" else w / (snr + 1.0)
        return jnp.mean(jnp.mean(err, axis=(1, 2, 3)) * w)

    def train_step(state: BaselineTrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.unet, state.frozen, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.unet)
        return (
            state.replace(step=state.step + 1,
                          unet=optax.apply_updates(state.unet, updates),
                          opt_state=opt_state),
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
        )

    return train_step, init_state


class SDInpaintingPipeline:
    """Inference for the baseline (reference test_sdinpainting.py):
    one 9(+)channel UNet, same schedulers/CFG machinery as the BrushNet
    pipeline but with the conditioning concatenated into the UNet input."""

    def __init__(self, vae, text_encoder, tokenizer, unet,
                 schedule: Optional[NoiseSchedule] = None,
                 depth_conditioning_mode: Optional[str] = None,
                 normals_conditioning_mode: Optional[str] = None,
                 dtype=jnp.float32):
        from reflecting_reality_tpu.pipelines.brushnet_pipeline import (
            StableDiffusionBrushNetPipeline,
        )

        # Reuse the BrushNet pipeline's host-side machinery with a null
        # brushnet; only the jitted core differs.
        self._base = StableDiffusionBrushNetPipeline(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            unet=unet, brushnet=unet,  # placeholder, never applied
            schedule=schedule,
            depth_conditioning_mode=depth_conditioning_mode,
            normals_conditioning_mode=normals_conditioning_mode,
            dtype=dtype,
        )
        self.unet_module, self.unet_params = unet
        self.dtype = dtype
        self._jit_cache = {}

    @property
    def image_processor(self):
        return self._base.image_processor

    def __call__(self, prompt, image, mask, depth=None, normals=None,
                 height=None, width=None, num_inference_steps=50,
                 guidance_scale=7.5, seed=0, scheduler="unipc",
                 output_type="np"):
        import numpy as np

        from reflecting_reality_tpu.pipelines.image_processor import interpolate_nearest
        from reflecting_reality_tpu.schedulers.common import ddim_timesteps
        from reflecting_reality_tpu.schedulers.ddim import ddim_step
        from reflecting_reality_tpu.schedulers.unipc import UniPCSampler

        b = self._base
        do_cfg = guidance_scale > 1.0
        rng = jax.random.PRNGKey(seed)
        rng_noise, rng_vae = jax.random.split(rng)

        prompt_embeds = b.encode_prompt(prompt, None, 1, do_cfg)
        image_np = b.image_processor.preprocess(image, height, width)
        mask_np = b.image_processor.preprocess(mask, height, width)
        h, w = image_np.shape[1:3]
        # baseline keeps the dataset convention: mirror = 1 (no <0 trick; the
        # reference baseline pipeline takes the mask image directly)
        mask_np = (mask_np.sum(-1, keepdims=True) > 0).astype(np.float32)
        hl, wl = h // 8, w // 8

        masked_lat = b._encode_sample(b.vae_params, jnp.asarray(image_np), rng_vae)
        mask_lat = jnp.asarray(interpolate_nearest(mask_np, hl, wl))
        cond = jnp.concatenate([mask_lat.astype(masked_lat.dtype), masked_lat], -1)
        if b.depth_conditioning_mode == "concat":
            d = interpolate_nearest(
                b.image_processor.preprocess(depth, h, w)[..., :1], hl, wl
            )
            cond = jnp.concatenate([cond, jnp.asarray(d).astype(cond.dtype)], -1)

        latents = jax.random.normal(rng_noise, (1, hl, wl, 4), jnp.float32)

        key = ((1, hl, wl), num_inference_steps, scheduler, do_cfg)
        if key not in self._jit_cache:
            if scheduler == "unipc":
                sampler = UniPCSampler(b.schedule, num_inference_steps)
                timesteps = sampler.timesteps
            else:
                timesteps = jnp.asarray(
                    ddim_timesteps(b.schedule.num_train_timesteps, num_inference_steps),
                    jnp.int32,
                )
                sampler = None
            unet = self.unet_module
            vae_module = b.vae_module
            dtype = self.dtype

            def run(uparams, vparams, latents, cond, embeds, guidance):
                cond_b = jnp.concatenate([cond, cond], 0) if do_cfg else cond

                def model(latents, t):
                    latent_in = jnp.concatenate([latents, latents], 0) if do_cfg else latents
                    inp = jnp.concatenate([latent_in, cond_b.astype(latent_in.dtype)], -1)
                    pred = unet.apply(uparams, inp.astype(dtype), t,
                                      embeds.astype(dtype))
                    if do_cfg:
                        u, c = jnp.split(pred, 2, 0)
                        pred = u + guidance * (c - u)
                    return pred

                if scheduler == "unipc":
                    state0 = sampler.init_state(latents)

                    def body(carry, xs):
                        lat, st = carry
                        i, t = xs
                        lat, st = sampler.step(model(lat, t), i, lat, st)
                        return (lat, st), None

                    (latents, _), _ = jax.lax.scan(
                        body, (latents, state0),
                        (jnp.arange(num_inference_steps), timesteps),
                    )
                else:
                    prev = jnp.concatenate([timesteps[1:], jnp.full((1,), -1, jnp.int32)])

                    def body(lat, xs):
                        t, tp = xs
                        return ddim_step(b.schedule, model(lat, t), t, tp, lat), None

                    latents, _ = jax.lax.scan(body, latents, (timesteps, prev))

                img = vae_module.apply(
                    vparams, (latents / b.scaling_factor).astype(dtype),
                    method=vae_module.decode,
                )
                return img.astype(jnp.float32)

            self._jit_cache[key] = jax.jit(run)

        out = self._jit_cache[key](
            self.unet_params, b.vae_params, latents, cond, prompt_embeds,
            jnp.float32(guidance_scale),
        )
        if output_type == "latent":
            return np.asarray(out)
        out = b._to_uint8(out)  # device-side uint8: 4x fewer fetched bytes
        if output_type == "device":
            return out  # async un-fetched uint8 (see brushnet_pipeline.__call__)
        return b.image_processor.postprocess(np.asarray(out), output_type=output_type)
