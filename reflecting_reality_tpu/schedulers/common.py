"""Shared noise-schedule math (reference: src/diffusers/schedulers/scheduling_ddpm.py:129
and scheduling_utils.py), as a frozen pytree usable inside jit/scan.

All schedule tensors are fp32; sampler state lives in explicit carries, never
in Python object attributes, so a 50-step denoise loop compiles to one
`lax.scan`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class NoiseSchedule(NamedTuple):
    betas: jnp.ndarray            # (T,)
    alphas_cumprod: jnp.ndarray   # (T,)
    num_train_timesteps: int
    prediction_type: str = "epsilon"

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        prediction_type: str = "epsilon",
        trained_betas=None,
    ) -> "NoiseSchedule":
        if trained_betas is not None:
            betas = np.asarray(trained_betas, dtype=np.float32)
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float32)
        elif beta_schedule == "scaled_linear":
            # The SD-1.5 latent-diffusion schedule.
            betas = (
                np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float32)
                ** 2
            )
        elif beta_schedule == "squaredcos_cap_v2":
            ts = np.arange(num_train_timesteps, dtype=np.float64)
            f = lambda t: np.cos((t / num_train_timesteps + 0.008) / 1.008 * np.pi / 2) ** 2
            betas = np.clip(1.0 - f(ts + 1) / f(ts), 0, 0.999).astype(np.float32)
        else:
            raise NotImplementedError(beta_schedule)
        alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
        return cls(
            betas=jnp.asarray(betas),
            alphas_cumprod=jnp.asarray(alphas_cumprod),
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
        )

    def sqrt_alpha_prod(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.sqrt(self.alphas_cumprod[t])

    def sqrt_one_minus_alpha_prod(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.sqrt(1.0 - self.alphas_cumprod[t])


def _bcast(coef: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Broadcast a (B,) coefficient over trailing sample dims."""
    return coef.reshape(coef.shape + (1,) * (ndim - coef.ndim))


def add_noise(
    schedule: NoiseSchedule, original: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
) -> jnp.ndarray:
    """x_t = sqrt(acp_t) x_0 + sqrt(1-acp_t) eps (reference: scheduling_ddpm.py:501)."""
    sa = _bcast(schedule.sqrt_alpha_prod(timesteps), original.ndim)
    sb = _bcast(schedule.sqrt_one_minus_alpha_prod(timesteps), original.ndim)
    return sa * original.astype(jnp.float32) + sb * noise.astype(jnp.float32)


def get_velocity(
    schedule: NoiseSchedule, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
) -> jnp.ndarray:
    """v = sqrt(acp) eps - sqrt(1-acp) x_0 (v-prediction target)."""
    sa = _bcast(schedule.sqrt_alpha_prod(timesteps), sample.ndim)
    sb = _bcast(schedule.sqrt_one_minus_alpha_prod(timesteps), sample.ndim)
    return sa * noise.astype(jnp.float32) - sb * sample.astype(jnp.float32)


def compute_snr(schedule: NoiseSchedule, timesteps: jnp.ndarray) -> jnp.ndarray:
    """SNR(t) = acp/(1-acp) (reference: src/diffusers/training_utils.py:50)."""
    acp = schedule.alphas_cumprod[timesteps]
    return acp / (1.0 - acp)


def make_inference_timesteps(
    num_train_timesteps: int,
    num_inference_steps: int,
    spacing: str = "linspace",
    steps_offset: int = 0,
) -> np.ndarray:
    """Descending int timesteps per diffusers' Table-2 spacings
    (reference: scheduling_unipc_multistep.py:229-260)."""
    if spacing == "linspace":
        ts = (
            np.linspace(0, num_train_timesteps - 1, num_inference_steps + 1)
            .round()[::-1][:-1]
            .astype(np.int64)
        )
    elif spacing == "leading":
        step_ratio = num_train_timesteps // (num_inference_steps + 1)
        ts = (np.arange(0, num_inference_steps + 1) * step_ratio).round()[::-1][:-1].astype(np.int64)
        ts += steps_offset
    elif spacing == "trailing":
        step_ratio = num_train_timesteps / num_inference_steps
        ts = np.arange(num_train_timesteps, 0, -step_ratio).round().astype(np.int64) - 1
    else:
        raise ValueError(spacing)
    return ts.copy()


def ddim_timesteps(
    num_train_timesteps: int, num_inference_steps: int, steps_offset: int = 1
) -> np.ndarray:
    """DDIM 'leading' spacing (reference: scheduling_ddim.py set_timesteps)."""
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
    return ts + steps_offset
