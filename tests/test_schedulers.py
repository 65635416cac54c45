"""Golden-value parity tests: our functional schedulers vs the reference torch
schedulers (pattern: reference tests/schedulers/test_scheduler_unipc.py, but
checking full trajectories against pre-generated golden data).

Golden data is produced by tests/golden/generate_golden_schedulers.py from the
read-only reference checkout; tests only read the .npz.  Samples are NCHW in
the golden file (torch layout) — scheduler math is layout-agnostic, so we feed
them through unchanged.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflecting_reality_tpu.schedulers.common import (
    NoiseSchedule, add_noise, get_velocity, compute_snr, ddim_timesteps,
)
from reflecting_reality_tpu.schedulers.ddim import ddim_step
from reflecting_reality_tpu.schedulers.unipc import UniPCSampler

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "schedulers.npz")
SHAPE = (1, 4, 8, 8)

sd_schedule = lambda: NoiseSchedule.create(
    num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
    beta_schedule="scaled_linear",
)


def fake_eps(x, t):
    grid = np.linspace(-1, 1, int(np.prod(SHAPE))).reshape(SHAPE).astype(np.float32)
    return 0.1 * x + np.sin(0.01 * float(t)) * grid


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden data not generated")
    return np.load(GOLDEN)


class TestNoiseSchedule:
    def test_alphas_cumprod_matches_reference(self, golden):
        sched = sd_schedule()
        np.testing.assert_allclose(
            np.asarray(sched.alphas_cumprod), golden["alphas_cumprod"], rtol=1e-5
        )

    def test_add_noise_and_velocity(self, golden):
        sched = sd_schedule()
        x0 = jnp.asarray(golden["ddpm_x0"])
        noise = jnp.asarray(golden["ddpm_noise"])
        for k, t in enumerate(golden["ddpm_ts"]):
            got = add_noise(sched, x0, noise, jnp.array([t]))
            np.testing.assert_allclose(np.asarray(got), golden["ddpm_noisy"][k], rtol=2e-5, atol=1e-6)
            gv = get_velocity(sched, x0, noise, jnp.array([t]))
            np.testing.assert_allclose(np.asarray(gv), golden["ddpm_velocity"][k], rtol=2e-5, atol=1e-6)

    def test_snr(self):
        sched = sd_schedule()
        snr = compute_snr(sched, jnp.array([0, 500, 999]))
        acp = np.asarray(sched.alphas_cumprod)[[0, 500, 999]]
        np.testing.assert_allclose(np.asarray(snr), acp / (1 - acp), rtol=1e-6)


def _run_unipc_traj(num_steps, spacing="linspace", steps_offset=0):
    sampler = UniPCSampler(
        sd_schedule(), num_steps, timestep_spacing=spacing, steps_offset=steps_offset
    )
    return sampler


class TestUniPC:
    @pytest.mark.parametrize(
        "steps,key_ts,key_traj,spacing,offset",
        [
            (50, "unipc_ts_50", "unipc_traj_50", "linspace", 0),
            (20, "unipc_ts_20", "unipc_traj_20", "linspace", 0),
            (10, "unipc_ts_lead", "unipc_traj_lead", "leading", 1),
        ],
    )
    def test_trajectory_matches_reference(self, golden, steps, key_ts, key_traj, spacing, offset):
        sampler = _run_unipc_traj(steps, spacing, offset)
        np.testing.assert_array_equal(np.asarray(sampler.timesteps), golden[key_ts])

        traj_ref = golden[key_traj]
        x = jnp.asarray(traj_ref[0])
        state = sampler.init_state(x)
        for i in range(steps):
            t = int(golden[key_ts][i])
            eps = jnp.asarray(fake_eps(np.asarray(x), t))
            x, state = sampler.step(eps, i, x, state)
            np.testing.assert_allclose(
                np.asarray(x), traj_ref[i + 1], rtol=1e-3, atol=3e-4,
                err_msg=f"step {i} (t={t})",
            )

    def test_scan_matches_python_loop(self, golden):
        """The scan-compiled sampler must equal the step-by-step loop."""
        steps = 20
        sampler = _run_unipc_traj(steps)
        x0 = jnp.asarray(golden["unipc_traj_20"][0])
        grid = jnp.asarray(
            np.linspace(-1, 1, int(np.prod(SHAPE))).reshape(SHAPE).astype(np.float32)
        )

        def eps_fn(x, t):
            return 0.1 * x + jnp.sin(0.01 * t.astype(jnp.float32)) * grid

        def body(carry, i):
            x, state = carry
            t = sampler.timesteps[i]
            x, state = sampler.step(eps_fn(x, t), i, x, state)
            return (x, state), None

        @jax.jit
        def run(x0):
            state = sampler.init_state(x0)
            (x, _), _ = jax.lax.scan(body, (x0, state), jnp.arange(steps))
            return x

        out = run(x0)
        np.testing.assert_allclose(
            np.asarray(out), golden["unipc_traj_20"][-1], rtol=1e-3, atol=3e-4
        )


class TestDDIM:
    def test_trajectory_matches_reference(self, golden):
        sched = sd_schedule()
        steps = 20
        ts = ddim_timesteps(1000, steps, steps_offset=1)
        np.testing.assert_array_equal(ts, golden["ddim_ts"])
        traj_ref = golden["ddim_traj"]
        x = jnp.asarray(traj_ref[0])
        for i, t in enumerate(ts):
            prev_t = t - 1000 // steps
            eps = jnp.asarray(fake_eps(np.asarray(x), t))
            x = ddim_step(sched, eps, jnp.int32(t), jnp.int32(prev_t), x)
            np.testing.assert_allclose(
                np.asarray(x), traj_ref[i + 1], rtol=1e-3, atol=3e-4,
                err_msg=f"step {i} (t={t})",
            )


class TestUniPCOrder3:
    """Golden parity at solver_order=3 (reference supports up to 3; full
    3-deep history + 3x3 rhos solve, scheduling_unipc_multistep.py:562-753)."""

    @pytest.mark.parametrize("steps", [10, 20, 50])
    def test_order3_trajectory(self, golden, steps):
        key_ts, key_traj = f"unipc_ts_o3_{steps}", f"unipc_traj_o3_{steps}"
        if key_traj not in golden:
            pytest.skip("order-3 golden not generated")
        sched = sd_schedule()
        sampler = UniPCSampler(sched, steps, solver_order=3)
        np.testing.assert_array_equal(np.asarray(sampler.timesteps), golden[key_ts])
        x = jnp.asarray(golden[key_traj][0])
        state = sampler.init_state(x)
        for i, t in enumerate(np.asarray(sampler.timesteps)):
            eps = jnp.asarray(fake_eps(np.asarray(x), t))
            x, state = sampler.step(eps, i, x, state)
            np.testing.assert_allclose(
                np.asarray(x), golden[key_traj][i + 1],
                rtol=1e-3, atol=3e-4, err_msg=f"step {i} (t={t})",
            )

    def test_order3_differs_from_order2(self, golden):
        """Sanity: the 3rd-order terms actually engage."""
        if "unipc_traj_o3_20" not in golden:
            pytest.skip("order-3 golden not generated")
        assert np.abs(golden["unipc_traj_o3_20"][-1] - golden["unipc_traj_20"][-1]).max() > 1e-6


class TestUniPCOrder1:
    def test_order1_trajectory(self, golden):
        if "unipc_traj_o1" not in golden:
            pytest.skip("order-1 golden not generated")
        sched = sd_schedule()
        sampler = UniPCSampler(sched, 10, solver_order=1)
        np.testing.assert_array_equal(
            np.asarray(sampler.timesteps), golden["unipc_ts_o1"]
        )
        x = jnp.asarray(golden["unipc_traj_o1"][0])
        state = sampler.init_state(x)
        for i, t in enumerate(np.asarray(sampler.timesteps)):
            eps = jnp.asarray(fake_eps(x, t))
            x, state = sampler.step(eps, i, x, state)
            np.testing.assert_allclose(
                np.asarray(x), golden["unipc_traj_o1"][i + 1],
                rtol=2e-4, atol=2e-5, err_msg=f"step {i}",
            )
