"""The MirrorFusion training step, as one jitted SPMD program.

Rebuilds the reference hot loop (reference:
examples/brushnet/train_brushnet_mirror.py:1346-1523 — see SURVEY.md §3.1)
the TPU way: instead of Accelerate DDP (one process per GPU + NCCL
allreduce), the step jits once over a 1-D "data" mesh; the batch is sharded
on its leading axis, params are replicated, and XLA inserts the gradient
psum over ICI.

Per step (exact reference contracts):
- VAE-encode pixel_values and conditioning_pixel_values, sample, x0.18215
  (:1351-1355)
- nearest-interp mask to latent res, concat (:1357-1365); depth `concat`
  (1ch interp) or `latents` (3ch-repeat VAE-encoded) (:1368-1384); normals
  concat/latents/ip_adapter (:1387-1405)
- noise ~ N(0,1), t ~ U[0,1000), DDPM add_noise (:1408-1416)
- CLIP text encode (frozen) (:1419-1420)
- brushnet -> 12+1+15 residuals -> unet with add_samples (:1422)
- MSE vs epsilon/v target, optional SNR-gamma weighting (:1427-1451)
- global-norm grad clip over trainables, AdamW, LR schedule (:1459-1466)

Trainables: brushnet always; base unet iff `train_base_unet`
(reference MirrorFusionModel.get_trainable_modules :836-888).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from reflecting_reality_tpu.schedulers.common import NoiseSchedule, add_noise, get_velocity, compute_snr
from reflecting_reality_tpu.models.ip_adapter import (
    NormalProjModel, freq_encode, is_ip_param_path,
)
from reflecting_reality_tpu.training.ema import ema_update
from reflecting_reality_tpu.training.lr_schedules import get_schedule


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors the reference CLI flags (train_brushnet_mirror.py:359-793)."""

    learning_rate: float = 1e-5
    scale_lr: bool = False
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 500
    lr_num_cycles: float = 1.0
    lr_power: float = 1.0
    max_train_steps: int = 20000
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    snr_gamma: Optional[float] = None
    prediction_type: str = "epsilon"
    gradient_accumulation_steps: int = 1
    gradient_checkpointing: bool = False
    # "full": recompute the whole branch forward in the backward pass
    # (reference enable_gradient_checkpointing semantics).  "dots": save
    # matmul/attention outputs, recompute only cheap ops
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — less
    # recompute FLOPs for a modest activation-memory increase.
    gradient_checkpointing_policy: str = "full"
    train_base_unet: bool = False
    use_ema: bool = False
    ema_decay: float = 0.9999
    # EMA shadow-weight storage dtype.  fp32 matches the reference EMAModel;
    # "bf16" halves the shadow copy (~0.7 GB at SD-1.5 scale — the measured
    # 12 MB margin that keeps bs=4+EMA from fitting a 16 GB v5e).  bf16 EMA
    # is standard practice for diffusion fine-tunes: the averaged weights
    # move slowly, so bf16's 8 mantissa bits dominate the step-to-step delta.
    ema_dtype: str = "fp32"
    depth_conditioning_mode: Optional[str] = "concat"
    normals_conditioning_mode: Optional[str] = None
    scaling_factor: float = 0.18215
    num_train_timesteps: int = 1000


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    trainable: Dict[str, Any]      # {"brushnet": ..., ["unet": ...]}
    frozen: Dict[str, Any]         # {"vae": ..., "text": ..., ["unet": ...]}
    opt_state: Any
    ema: Optional[Dict[str, Any]] = None


def nearest_resize_nhwc(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') indexing: src = floor(dst*in/out)."""
    rows = (jnp.arange(h) * x.shape[1] // h).astype(jnp.int32)
    cols = (jnp.arange(w) * x.shape[2] // w).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def make_optimizer(config: TrainConfig, data_parallel_size: int = 1,
                   trainable_mask_fn=None):
    lr = config.learning_rate
    if config.scale_lr:
        # reference :1174-1177 multiplies by (grad_accum * batch * n_gpus);
        # here the mesh size plays the n_gpus role, batch is global already.
        lr = lr * data_parallel_size
    schedule = get_schedule(
        config.lr_scheduler, lr, config.lr_warmup_steps, config.max_train_steps,
        num_cycles=config.lr_num_cycles, power=config.lr_power,
    )
    adamw = optax.adamw(
        schedule, b1=config.adam_beta1, b2=config.adam_beta2,
        eps=config.adam_epsilon, weight_decay=config.adam_weight_decay,
    )
    if trainable_mask_fn is not None:
        # partial freeze (ip_adapter mode): AdamW's weight decay would move
        # zero-grad leaves, so route frozen leaves around the whole update.
        adamw = optax.masked(adamw, trainable_mask_fn)
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        adamw,
    )
    if config.gradient_accumulation_steps > 1:
        # reference accelerator.accumulate (:1349): average grads over K
        # micro-steps, apply on the Kth.
        tx = optax.MultiSteps(tx, config.gradient_accumulation_steps)
    return tx, schedule


def resolve_device_cache(batch, cache):
    """Materialize a per-step batch from a device-resident sample cache.

    `cache` holds the ENTIRE precomputed-latents dataset as device arrays
    (N, ...) — at latent resolution SynMirror is ~150 KB/sample, so even
    100K samples fit one chip's HBM with room to spare.  The host then
    ships only `index` (B,) int32 + `input_ids` per step and the rows are
    gathered on device — eliminating the per-step host->device input
    upload entirely (on relayed/remote transports that upload serializes
    with execution and dominates the step; see logs/e2e_r04/SUMMARY.md).
    No reference analogue (torch DataLoaders re-ship every batch)."""
    full = {k: jnp.take(v, batch["index"], axis=0) for k, v in cache.items()}
    full["input_ids"] = batch["input_ids"]
    return full


def assemble_conditioning_latents(
    vae_module, vae_params, batch: Dict[str, jnp.ndarray], rng: jax.Array,
    config: TrainConfig, dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """-> (latents, conditioning_latents, ip_adapter_normal).  NHWC.

    When the batch carries precomputed encoder moments (tools/
    precompute_latents.py: `latent_moments`, `cond_latent_moments`, and
    `depth_latent_moments`/`normals_latent_moments` for the `latents`
    modes), sampling draws from the cached DiagonalGaussian instead of
    running the VAE encoder — statistically identical to the reference's
    per-step `vae.encode(...).latent_dist.sample()` (the stochastic draw
    still happens every step), but the encoder FLOPs are paid once per
    dataset instead of once per step."""
    from reflecting_reality_tpu.models.vae import DiagonalGaussian

    r1, r2, r3, r4 = jax.random.split(rng, 4)
    enc = lambda img, r: vae_module.apply(
        vae_params, img.astype(dtype), method=vae_module.encode
    ).sample(r) * config.scaling_factor
    from_cache = lambda key, r: DiagonalGaussian.from_moments(
        batch[key].astype(dtype)
    ).sample(r) * config.scaling_factor

    cached = "latent_moments" in batch
    if cached:
        latents = from_cache("latent_moments", r1)
        cond = from_cache("cond_latent_moments", r2)
    else:
        latents = enc(batch["pixel_values"], r1)
        cond = enc(batch["conditioning_pixel_values"], r2)
    hl, wl = latents.shape[1:3]

    mask = nearest_resize_nhwc(batch["masks"], hl, wl)
    cond = jnp.concatenate([cond, mask.astype(cond.dtype)], axis=-1)

    if config.depth_conditioning_mode == "concat":
        d = nearest_resize_nhwc(batch["depths"], hl, wl)
        cond = jnp.concatenate([cond, d.astype(cond.dtype)], axis=-1)
    elif config.depth_conditioning_mode == "latents":
        if cached:
            cond = jnp.concatenate([cond, from_cache("depth_latent_moments", r3)], axis=-1)
        else:
            d3 = jnp.repeat(batch["depths"], 3, axis=-1)
            cond = jnp.concatenate([cond, enc(d3, r3)], axis=-1)

    normal_vec = None
    if config.normals_conditioning_mode == "concat":
        n = nearest_resize_nhwc(batch["normals"], hl, wl)
        cond = jnp.concatenate([cond, n.astype(cond.dtype)], axis=-1)
    elif config.normals_conditioning_mode == "latents":
        if cached:
            cond = jnp.concatenate([cond, from_cache("normals_latent_moments", r4)], axis=-1)
        else:
            cond = jnp.concatenate([cond, enc(batch["normals"], r4)], axis=-1)
    elif config.normals_conditioning_mode == "ip_adapter":
        normal_vec = batch["normals"]  # (B, 1, 3) normalized mirror normal

    return latents, cond, normal_vec


def make_train_step(unet, brushnet, vae, text_encoder, config: TrainConfig,
                    schedule: Optional[NoiseSchedule] = None, dtype=jnp.float32):
    """Returns (train_step, init_state).  train_step(state, batch, rng) ->
    (state, metrics); jit/shard it with parallel.mesh helpers."""
    noise_schedule = schedule or NoiseSchedule.create(
        num_train_timesteps=config.num_train_timesteps,
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        prediction_type=config.prediction_type,
    )
    ip_mode = config.normals_conditioning_mode == "ip_adapter"
    partial_freeze = ip_mode and not config.train_base_unet

    def trainable_mask_fn(params):
        def mask_unet(tree, path=()):
            if isinstance(tree, dict):
                return {k: mask_unet(v, path + (k,)) for k, v in tree.items()}
            return is_ip_param_path(path)

        return {
            k: (mask_unet(v) if k == "unet"
                else jax.tree_util.tree_map(lambda _: True, v))
            for k, v in params.items()
        }

    tx, _ = make_optimizer(
        config, trainable_mask_fn=trainable_mask_fn if partial_freeze else None
    )

    def init_state(brushnet_params, unet_params, vae_params, text_params,
                   normal_proj_params=None) -> TrainState:
        trainable = {"brushnet": brushnet_params}
        frozen = {"vae": vae_params, "text": text_params}
        if config.train_base_unet or ip_mode:
            # ip mode: unet lives in `trainable` so its to_k_ip/to_v_ip train;
            # non-ip unet grads are masked out below unless train_base_unet.
            trainable["unet"] = unet_params
        else:
            frozen["unet"] = unet_params
        if ip_mode:
            assert normal_proj_params is not None, "ip_adapter mode needs NormalProjModel params"
            trainable["normal_proj"] = normal_proj_params
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            trainable=trainable,
            frozen=frozen,
            opt_state=tx.init(trainable),
            # jnp.array (copy=True), NOT asarray: with fp32 EMA, asarray
            # aliases the trainable leaves, and the CLI's donate_argnums=(0,)
            # step then donates the same buffer twice (crash at step 1)
            ema=(jax.tree_util.tree_map(
                lambda p: jnp.array(
                    p, jnp.bfloat16 if config.ema_dtype == "bf16" else None),
                trainable) if config.use_ema else None),
        )

    def grad_mask(trainable):
        """1/0 tree: zero the grads of frozen-base-unet leaves in ip mode
        (reference trains brushnet + adapter modules only, :1192-1200)."""
        def mask_unet(tree, path=()):
            if isinstance(tree, dict):
                return {k: mask_unet(v, path + (k,)) for k, v in tree.items()}
            return 1.0 if (config.train_base_unet or is_ip_param_path(path)) else 0.0

        return {
            k: (mask_unet(v) if k == "unet" else jax.tree_util.tree_map(lambda _: 1.0, v))
            for k, v in trainable.items()
        }

    def loss_fn(trainable, frozen, batch, rng):
        unet_params = trainable.get("unet", frozen.get("unet"))
        r_cond, r_noise, r_t = jax.random.split(rng, 3)

        latents, cond, normal_vec = assemble_conditioning_latents(
            vae, frozen["vae"], batch, r_cond, config, dtype
        )
        latents = jax.lax.stop_gradient(latents)
        cond = jax.lax.stop_gradient(cond)

        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        bsz = latents.shape[0]
        timesteps = jax.random.randint(
            r_t, (bsz,), 0, config.num_train_timesteps, dtype=jnp.int32
        )
        noisy = add_noise(noise_schedule, latents, noise, timesteps)

        ehs = jax.lax.stop_gradient(
            text_encoder.apply(frozen["text"], batch["input_ids"])
        )

        brushnet_apply = brushnet.apply
        unet_apply = unet.apply
        if config.gradient_checkpointing:
            # remat both branch forwards: trade recompute for activation
            # memory (reference enable_gradient_checkpointing :1153-1155)
            remat_kwargs = {}
            if config.gradient_checkpointing_policy == "dots":
                remat_kwargs["policy"] = (
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                )
            elif config.gradient_checkpointing_policy != "full":
                raise ValueError(config.gradient_checkpointing_policy)
            brushnet_apply = jax.checkpoint(
                lambda p, *a, **k: brushnet.apply(p, *a, **k), **remat_kwargs
            )
            unet_apply = jax.checkpoint(
                lambda p, *a, **k: unet.apply(p, *a, **k), **remat_kwargs
            )

        down, mid, up = brushnet_apply(
            trainable["brushnet"], noisy.astype(dtype), timesteps,
            ehs.astype(dtype), cond.astype(dtype),
        )
        unet_ehs = ehs
        if ip_mode:
            # normal token appended AFTER the text tokens, unet-only
            # (brushnet sees plain text; reference MirrorFusionModel :858-888)
            tok = NormalProjModel(unet.cross_attention_dim, dtype=dtype).apply(
                trainable["normal_proj"], freq_encode(normal_vec.astype(jnp.float32))
            )
            unet_ehs = jnp.concatenate([ehs, tok.astype(ehs.dtype)], axis=1)
        pred = unet_apply(
            unet_params, noisy.astype(dtype), timesteps, unet_ehs.astype(dtype),
            down_block_add_samples=down, mid_block_add_sample=mid,
            up_block_add_samples=up,
        )

        if config.prediction_type == "epsilon":
            target = noise
        elif config.prediction_type == "v_prediction":
            target = get_velocity(noise_schedule, latents, noise, timesteps)
        else:
            raise ValueError(config.prediction_type)

        err = (pred.astype(jnp.float32) - target) ** 2
        if config.snr_gamma is None:
            loss = jnp.mean(err)
        else:
            snr = compute_snr(noise_schedule, timesteps)
            weights = jnp.minimum(snr, config.snr_gamma)
            if config.prediction_type == "epsilon":
                weights = weights / snr
            else:
                weights = weights / (snr + 1.0)
            loss = jnp.mean(jnp.mean(err, axis=(1, 2, 3)) * weights)
        return loss

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.trainable, state.frozen, batch, rng
        )
        if partial_freeze:
            grads = jax.tree_util.tree_map(
                lambda g, m: g * m, grads, grad_mask(state.trainable)
            )
        grad_norm = optax.global_norm(grads)
        # Non-finite guard: a NaN/Inf loss or gradient must never reach the
        # params or AdamW moments — keep the previous state for that step so
        # the cli-level abort (cli/train.py max_nonfinite_steps) checkpoints
        # clean weights.  lax.cond (not a post-hoc jnp.where select over the
        # new/old trees): a tree-wide select forces XLA to keep BOTH the
        # updated and the pre-update fp32 param/moment buffers live at once —
        # measured +2.8 GiB of HLO-temp copies at SD-1.5 scale, the
        # difference between bs=4+EMA fitting a 16 GiB v5e or OOMing.
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

        def _apply(operand):
            grads, trainable, opt_state, ema = operand
            updates, new_opt = tx.update(grads, opt_state, trainable)
            new_tr = optax.apply_updates(trainable, updates)
            new_ema = (
                ema_update(ema, new_tr, state.step, config.ema_decay)
                if config.use_ema else ema
            )
            return new_tr, new_opt, new_ema

        def _skip(operand):
            _, trainable, opt_state, ema = operand
            return trainable, opt_state, ema

        trainable, opt_state, ema = jax.lax.cond(
            finite, _apply, _skip,
            (grads, state.trainable, state.opt_state, state.ema),
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "nonfinite_skipped": (~finite).astype(jnp.float32),
        }
        return (
            state.replace(
                step=state.step + 1, trainable=trainable,
                opt_state=opt_state, ema=ema,
            ),
            metrics,
        )

    return train_step, init_state
