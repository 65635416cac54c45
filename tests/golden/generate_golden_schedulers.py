"""Generate golden scheduler trajectories from the reference implementation.

Runs the torch schedulers from /root/reference (read-only) on CPU with a
deterministic fake denoiser and stores the resulting trajectories as .npz.
The pytest suite (tests/test_schedulers.py) only reads the .npz files, so the
tests are self-contained once generated.

Usage: python tests/golden/generate_golden_schedulers.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference/MirrorFusion/src")

from diffusers.schedulers.scheduling_unipc_multistep import UniPCMultistepScheduler
from diffusers.schedulers.scheduling_ddim import DDIMScheduler
from diffusers.schedulers.scheduling_ddpm import DDPMScheduler

OUT = os.path.join(os.path.dirname(__file__), "schedulers.npz")

SD_BETAS = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
                num_train_timesteps=1000)
SHAPE = (1, 4, 8, 8)


def fake_eps(x, t):
    # Deterministic, timestep- and sample-dependent "model".  Pinned to
    # float32: numpy-2 promotion would otherwise yield float64 here, and the
    # reference scheduler's order-3 linalg.solve path is float32-only.
    grid = np.linspace(-1, 1, int(np.prod(SHAPE))).reshape(SHAPE).astype(np.float32)
    return (0.1 * x + np.sin(0.01 * float(t)) * grid).astype(np.float32)


def run_unipc(num_steps, spacing="linspace", steps_offset=0, solver_order=2):
    sched = UniPCMultistepScheduler(
        solver_order=solver_order, timestep_spacing=spacing,
        steps_offset=steps_offset, **SD_BETAS
    )
    sched.set_timesteps(num_steps)
    rng = np.random.RandomState(42)
    x = torch.from_numpy(rng.randn(*SHAPE).astype(np.float32))
    traj = [x.numpy().copy()]
    for t in sched.timesteps:
        eps = torch.from_numpy(fake_eps(x.numpy(), t.item()))
        x = sched.step(eps, t, x, return_dict=False)[0]
        traj.append(x.numpy().copy())
    return np.asarray(sched.timesteps), np.stack(traj)


def run_ddim(num_steps):
    sched = DDIMScheduler(
        set_alpha_to_one=False, steps_offset=1, clip_sample=False, **SD_BETAS
    )
    sched.set_timesteps(num_steps)
    rng = np.random.RandomState(7)
    x = torch.from_numpy(rng.randn(*SHAPE).astype(np.float32))
    traj = [x.numpy().copy()]
    for t in sched.timesteps:
        eps = torch.from_numpy(fake_eps(x.numpy(), t.item()))
        x = sched.step(eps, t, x, return_dict=False)[0]
        traj.append(x.numpy().copy())
    return np.asarray(sched.timesteps), np.stack(traj)


def run_ddpm_add_noise():
    sched = DDPMScheduler(**SD_BETAS)
    rng = np.random.RandomState(3)
    x0 = torch.from_numpy(rng.randn(*SHAPE).astype(np.float32))
    noise = torch.from_numpy(rng.randn(*SHAPE).astype(np.float32))
    ts = torch.tensor([0, 1, 10, 500, 999])
    noisy = [
        sched.add_noise(x0, noise, torch.tensor([t])).numpy() for t in ts
    ]
    velocity = [
        sched.get_velocity(x0, noise, torch.tensor([t])).numpy() for t in ts
    ]
    return (
        x0.numpy(), noise.numpy(), ts.numpy(), np.stack(noisy), np.stack(velocity),
        np.asarray(sched.alphas_cumprod.numpy()),
    )


def main():
    u_ts_50, u_traj_50 = run_unipc(50)
    u_ts_20, u_traj_20 = run_unipc(20)
    u_ts_lead, u_traj_lead = run_unipc(10, spacing="leading", steps_offset=1)
    u_ts_o1, u_traj_o1 = run_unipc(10, solver_order=1)
    u_ts_o3_10, u_traj_o3_10 = run_unipc(10, solver_order=3)
    u_ts_o3_20, u_traj_o3_20 = run_unipc(20, solver_order=3)
    u_ts_o3_50, u_traj_o3_50 = run_unipc(50, solver_order=3)
    d_ts, d_traj = run_ddim(20)
    x0, noise, ts, noisy, velocity, acp = run_ddpm_add_noise()
    np.savez_compressed(
        OUT,
        unipc_ts_50=u_ts_50, unipc_traj_50=u_traj_50,
        unipc_ts_20=u_ts_20, unipc_traj_20=u_traj_20,
        unipc_ts_lead=u_ts_lead, unipc_traj_lead=u_traj_lead,
        unipc_ts_o1=u_ts_o1, unipc_traj_o1=u_traj_o1,
        unipc_ts_o3_10=u_ts_o3_10, unipc_traj_o3_10=u_traj_o3_10,
        unipc_ts_o3_20=u_ts_o3_20, unipc_traj_o3_20=u_traj_o3_20,
        unipc_ts_o3_50=u_ts_o3_50, unipc_traj_o3_50=u_traj_o3_50,
        ddim_ts=d_ts, ddim_traj=d_traj,
        ddpm_x0=x0, ddpm_noise=noise, ddpm_ts=ts, ddpm_noisy=noisy,
        ddpm_velocity=velocity, alphas_cumprod=acp,
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
