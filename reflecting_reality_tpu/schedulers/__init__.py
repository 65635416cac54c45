from reflecting_reality_tpu.schedulers.common import (
    NoiseSchedule, add_noise, compute_snr, ddim_timesteps, get_velocity,
    make_inference_timesteps,
)
from reflecting_reality_tpu.schedulers.ddim import ddim_step
from reflecting_reality_tpu.schedulers.ddpm import ddpm_step
from reflecting_reality_tpu.schedulers.unipc import UniPCSampler, UniPCState

__all__ = [
    "NoiseSchedule", "UniPCSampler", "UniPCState", "add_noise", "compute_snr",
    "ddim_step", "ddim_timesteps", "ddpm_step", "get_velocity",
    "make_inference_timesteps",
]
