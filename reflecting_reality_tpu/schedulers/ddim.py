"""Functional DDIM step (reference: src/diffusers/schedulers/scheduling_ddim.py:131,344).

Stateless: each step needs only (schedule, t, t_prev, sample, model_output).
`final_alpha_cumprod` follows set_alpha_to_one=False (SD convention): when
t_prev < 0, alpha_prod_prev = alphas_cumprod[0].
"""

from __future__ import annotations

import jax.numpy as jnp

from reflecting_reality_tpu.schedulers.common import NoiseSchedule


def ddim_step(
    schedule: NoiseSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    sample: jnp.ndarray,
    eta: float = 0.0,
    set_alpha_to_one: bool = False,
) -> jnp.ndarray:
    acp = schedule.alphas_cumprod
    alpha_prod_t = acp[timestep]
    final_alpha = jnp.float32(1.0) if set_alpha_to_one else acp[0]
    alpha_prod_prev = jnp.where(prev_timestep >= 0, acp[jnp.maximum(prev_timestep, 0)], final_alpha)
    beta_prod_t = 1.0 - alpha_prod_t

    x = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)

    if schedule.prediction_type == "epsilon":
        pred_x0 = (x - jnp.sqrt(beta_prod_t) * eps) / jnp.sqrt(alpha_prod_t)
        pred_eps = eps
    elif schedule.prediction_type == "v_prediction":
        pred_x0 = jnp.sqrt(alpha_prod_t) * x - jnp.sqrt(beta_prod_t) * eps
        pred_eps = jnp.sqrt(alpha_prod_t) * eps + jnp.sqrt(beta_prod_t) * x
    elif schedule.prediction_type == "sample":
        pred_x0 = eps
        pred_eps = (x - jnp.sqrt(alpha_prod_t) * pred_x0) / jnp.sqrt(beta_prod_t)
    else:
        raise ValueError(schedule.prediction_type)

    if eta != 0.0:
        variance = (1.0 - alpha_prod_prev) / (1.0 - alpha_prod_t) * (
            1.0 - alpha_prod_t / alpha_prod_prev
        )
        std = eta * jnp.sqrt(variance)
    else:
        std = jnp.float32(0.0)

    pred_dir = jnp.sqrt(1.0 - alpha_prod_prev - std**2) * pred_eps
    prev_sample = jnp.sqrt(alpha_prod_prev) * pred_x0 + pred_dir
    return prev_sample.astype(sample.dtype)
