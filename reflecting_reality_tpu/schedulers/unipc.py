"""UniPC multistep sampler in functional, scan-compatible form
(reference: src/diffusers/schedulers/scheduling_unipc_multistep.py:74,754).

The torch implementation mutates `model_outputs` / `last_sample` /
`step_index`; here the history is an explicit fixed-shape carry
(`UniPCState`), the step index is the scan counter, and the varying
predictor/corrector order is handled with masked arithmetic instead of
branches, so 50 steps compile into a single `lax.scan`.

Defaults match MirrorFusion inference: solver_order=2, predict_x0, bh2,
lower_order_final, corrector enabled, epsilon prediction
(reference pipeline swap at examples/brushnet/test_brushnet.py:158).
Exactness vs the reference is enforced by golden-trajectory tests
(tests/test_schedulers.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from reflecting_reality_tpu.schedulers.common import NoiseSchedule, make_inference_timesteps


class UniPCState(NamedTuple):
    # x0-prediction history: [-1] is the most recent (m0), [-2] the one before.
    model_outputs: jnp.ndarray  # (2, *sample_shape)
    last_sample: jnp.ndarray    # sample before the latest predictor step


class UniPCSampler:
    """Precomputes the sigma/lambda tables for a fixed step count; `step` is a
    pure function of (i, model_output, sample, state)."""

    order = 1  # pipeline-visible "scheduler order" (steps per model call)
    init_noise_sigma = 1.0

    def __init__(
        self,
        schedule: NoiseSchedule,
        num_inference_steps: int,
        solver_order: int = 2,
        solver_type: str = "bh2",
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
        lower_order_final: bool = True,
    ):
        if solver_order not in (1, 2):
            raise NotImplementedError(
                "solver_order 1/2 supported (2 is the MirrorFusion/diffusers "
                "default); order 3 would need a longer history carry."
            )
        assert solver_type in ("bh1", "bh2")
        self.schedule = schedule
        self.num_steps = int(num_inference_steps)
        self.solver_order = solver_order
        self.solver_type = solver_type
        self.lower_order_final = lower_order_final

        ts = make_inference_timesteps(
            schedule.num_train_timesteps, self.num_steps, timestep_spacing, steps_offset
        )
        acp = np.asarray(schedule.alphas_cumprod)
        sig_all = ((1.0 - acp) / acp) ** 0.5
        sigmas = np.interp(ts, np.arange(len(sig_all)), sig_all)
        sigma_last = ((1.0 - acp[0]) / acp[0]) ** 0.5
        sigmas = np.concatenate([sigmas, [sigma_last]]).astype(np.float32)

        # sigma -> (alpha_t, sigma_t): alpha = 1/sqrt(1+sigma^2), sigma_t = sigma*alpha
        alphas = 1.0 / np.sqrt(1.0 + sigmas**2)
        sigmas_t = sigmas * alphas
        self.timesteps = jnp.asarray(ts, dtype=jnp.int32)          # (N,)
        self._alpha = jnp.asarray(alphas, dtype=jnp.float32)        # (N+1,)
        self._sigma = jnp.asarray(sigmas_t, dtype=jnp.float32)      # (N+1,)
        self._lambda = jnp.asarray(
            np.log(alphas) - np.log(sigmas_t), dtype=jnp.float32
        )

    # -- state ---------------------------------------------------------------

    def init_state(self, sample: jnp.ndarray) -> UniPCState:
        z = jnp.zeros_like(sample, dtype=jnp.float32)
        return UniPCState(
            model_outputs=jnp.stack([z, z]),
            last_sample=z,
        )

    def scale_model_input(self, sample: jnp.ndarray, i=None) -> jnp.ndarray:
        return sample  # UniPC does not scale inputs

    # -- math helpers ----------------------------------------------------------

    def _b_h(self, hh: jnp.ndarray) -> jnp.ndarray:
        return jnp.expm1(hh) if self.solver_type == "bh2" else hh

    def _convert_to_x0(self, model_output, sample, i):
        a, s = self._alpha[i], self._sigma[i]
        pt = self.schedule.prediction_type
        x = sample.astype(jnp.float32)
        m = model_output.astype(jnp.float32)
        if pt == "epsilon":
            return (x - s * m) / a
        if pt == "v_prediction":
            return a * x - s * m
        if pt == "sample":
            return m
        raise ValueError(pt)

    # -- the step -------------------------------------------------------------

    def step(
        self,
        model_output: jnp.ndarray,
        i: jnp.ndarray,                 # scan counter 0..num_steps-1 (traced ok)
        sample: jnp.ndarray,
        state: UniPCState,
    ) -> Tuple[jnp.ndarray, UniPCState]:
        N = self.num_steps
        lam, alp, sig = self._lambda, self._alpha, self._sigma
        i = jnp.asarray(i, dtype=jnp.int32)
        im1 = jnp.maximum(i - 1, 0)
        im2 = jnp.maximum(i - 2, 0)

        x0 = self._convert_to_x0(model_output, sample, i)
        m0 = state.model_outputs[-1]
        m1 = state.model_outputs[-2]

        # ---- corrector (uni_c) on the incoming sample, active for i >= 1.
        # Interval: s0 = step i-1 -> t = step i.
        h_c = lam[i] - lam[im1]
        hh_c = -h_c
        h_phi_1_c = jnp.expm1(hh_c)
        B_h_c = self._b_h(hh_c)
        b0_c = (h_phi_1_c / hh_c - 1.0) / B_h_c
        b1_c = 2.0 * ((h_phi_1_c / hh_c - 1.0) / hh_c - 0.5) / B_h_c

        # order-2 corrector uses m1 (x0 pred from step i-2); active for i >= 2
        use_c2 = (i >= 2) if self.solver_order >= 2 else jnp.bool_(False)
        r0_c = (lam[im2] - lam[im1]) / h_c
        r0_c_safe = jnp.where(use_c2, r0_c, 0.5)
        D1s_c = (m1 - m0) / jnp.where(use_c2, r0_c_safe, 1.0)
        det = 1.0 - r0_c_safe
        rc0 = (b0_c - b1_c) / det
        rc1 = (b1_c - r0_c_safe * b0_c) / det
        # order-1 corrector: rhos_c = [0.5] applied to D1_t only
        rc0 = jnp.where(use_c2, rc0, 0.0)
        rc1 = jnp.where(use_c2, rc1, 0.5)

        D1_t = x0 - m0
        x_corr_base = (
            sig[i] / sig[im1] * state.last_sample - alp[i] * h_phi_1_c * m0
        )
        corrected = x_corr_base - alp[i] * B_h_c * (rc0 * D1s_c + rc1 * D1_t)
        sample_f = jnp.where(i >= 1, corrected, sample.astype(jnp.float32))

        # ---- history shift
        new_outputs = jnp.stack([m0, x0])

        # ---- predictor (uni_p): step i -> i+1.
        h_p = lam[i + 1] - lam[i]
        hh_p = -h_p
        h_phi_1_p = jnp.expm1(hh_p)
        B_h_p = self._b_h(hh_p)

        # this_order = min(solver_order, N - i, i + 1)  [lower_order_final]
        if self.solver_order == 1:
            use_p2 = jnp.bool_(False)
        elif self.lower_order_final:
            use_p2 = (i >= 1) & ((N - i) >= 2)
        else:
            use_p2 = i >= 1
        r0_p = (lam[im1] - lam[i]) / h_p
        D1_p = (m0 - x0) / jnp.where(use_p2, jnp.where(r0_p == 0, 1.0, r0_p), 1.0)
        x_pred_base = sig[i + 1] / sig[i] * sample_f - alp[i + 1] * h_phi_1_p * x0
        pred_res = jnp.where(use_p2, 0.5, 0.0) * D1_p
        prev_sample = x_pred_base - alp[i + 1] * B_h_p * pred_res

        new_state = UniPCState(model_outputs=new_outputs, last_sample=sample_f)
        return prev_sample.astype(sample.dtype), new_state
