"""Functional DDPM ancestral step (reference: scheduling_ddpm.py:129, step at :399).

Used for completeness (the reference trains with DDPM.add_noise — see
schedulers/common.py — and samples with UniPC/DDIM).  Variance type
'fixed_small' only, the DDPM default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reflecting_reality_tpu.schedulers.common import NoiseSchedule


def ddpm_step(
    schedule: NoiseSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    sample: jnp.ndarray,
    rng: jax.Array,
    clip_sample: bool = True,
    clip_sample_range: float = 1.0,
) -> jnp.ndarray:
    acp = schedule.alphas_cumprod
    alpha_prod_t = acp[timestep]
    alpha_prod_prev = jnp.where(prev_timestep >= 0, acp[jnp.maximum(prev_timestep, 0)], 1.0)
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_prev = 1.0 - alpha_prod_prev
    current_alpha = alpha_prod_t / alpha_prod_prev
    current_beta = 1.0 - current_alpha

    x = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)

    if schedule.prediction_type == "epsilon":
        pred_x0 = (x - jnp.sqrt(beta_prod_t) * eps) / jnp.sqrt(alpha_prod_t)
    elif schedule.prediction_type == "v_prediction":
        pred_x0 = jnp.sqrt(alpha_prod_t) * x - jnp.sqrt(beta_prod_t) * eps
    elif schedule.prediction_type == "sample":
        pred_x0 = eps
    else:
        raise ValueError(schedule.prediction_type)

    if clip_sample:
        pred_x0 = jnp.clip(pred_x0, -clip_sample_range, clip_sample_range)

    pred_x0_coeff = jnp.sqrt(alpha_prod_prev) * current_beta / beta_prod_t
    current_coeff = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
    mean = pred_x0_coeff * pred_x0 + current_coeff * x

    variance = jnp.clip(beta_prod_prev / beta_prod_t * current_beta, min=1e-20)
    noise = jax.random.normal(rng, sample.shape, dtype=jnp.float32)
    add = jnp.where(timestep > 0, jnp.sqrt(variance), 0.0) * noise
    return (mean + add).astype(sample.dtype)
