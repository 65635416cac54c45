"""UniPC multistep sampler in functional, scan-compatible form
(reference: src/diffusers/schedulers/scheduling_unipc_multistep.py:74,754).

The torch implementation mutates `model_outputs` / `last_sample` /
`step_index`; here the history is an explicit fixed-shape carry
(`UniPCState`), the step index is the scan counter, and the varying
predictor/corrector order is handled with masked arithmetic instead of
branches, so 50 steps compile into a single `lax.scan`.

Solver orders 1-3 are supported (the reference caps solver_order at 3,
scheduling_unipc_multistep.py:562-753).  The per-step effective order is

    pred order  p_i = min(solver_order, N - i, i + 1)     [lower_order_final]
    corr order  c_i = p_{i-1} = min(solver_order, N - i + 1, i)

and the rhos for each candidate order are computed in closed form (Cramer)
each step and selected with `where` — three scalar solves per step instead of
a data-dependent branch, which is what `scan` wants.

Defaults match MirrorFusion inference: solver_order=2, predict_x0, bh2,
lower_order_final, corrector enabled, epsilon prediction
(reference pipeline swap at examples/brushnet/test_brushnet.py:158).
Exactness vs the reference is enforced by golden-trajectory tests at orders
1, 2 AND 3 (tests/test_schedulers.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from reflecting_reality_tpu.schedulers.common import NoiseSchedule, make_inference_timesteps


class UniPCState(NamedTuple):
    # x0-prediction history: [-1] is the most recent (m0), [-2] the one
    # before, [-3] the one before that (only read at solver_order=3).
    model_outputs: jnp.ndarray  # (3, *sample_shape)
    last_sample: jnp.ndarray    # sample before the latest predictor step


def _safe(x: jnp.ndarray) -> jnp.ndarray:
    """Replace exact zeros with 1 so masked-out divisions stay finite."""
    return jnp.where(x == 0, 1.0, x)


def _det3(r1, r2, r3, s1, s2, s3, t1, t2, t3):
    """det of [[r1,r2,r3],[s1,s2,s3],[t1,t2,t3]] (scalars)."""
    return (
        r1 * (s2 * t3 - s3 * t2)
        - r2 * (s1 * t3 - s3 * t1)
        + r3 * (s1 * t2 - s2 * t1)
    )


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
        if solver_order not in (1, 2, 3):
            raise ValueError(
                "solver_order must be 1, 2 or 3 (the reference scheduler's "
                "supported range, scheduling_unipc_multistep.py:74)"
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
            model_outputs=jnp.stack([z, z, z]),
            last_sample=z,
        )

    def scale_model_input(self, sample: jnp.ndarray, i=None) -> jnp.ndarray:
        return sample  # UniPC does not scale inputs

    # -- math helpers ----------------------------------------------------------

    def _bh_coeffs(self, hh: jnp.ndarray):
        """b_k/B_h per the reference recurrence (uni_p/uni_c :678-694):
        k1 = phi1/hh - 1; b0 = k1/B_h; b1 = 2(k1/hh - 1/2)/B_h;
        b2 = 6((k1/hh - 1/2)/hh - 1/6)/B_h."""
        h_phi_1 = jnp.expm1(hh)
        B_h = jnp.expm1(hh) if self.solver_type == "bh2" else hh
        k1 = h_phi_1 / hh - 1.0
        k2 = k1 / hh - 0.5
        k3 = k2 / hh - 1.0 / 6.0
        return k1 / B_h, 2.0 * k2 / B_h, 6.0 * k3 / B_h, h_phi_1, B_h

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

    def _effective_orders(self, i: jnp.ndarray):
        """(pred order at step i, corrector order at step i) — the reference's
        this_order bookkeeping (step() :806-816) made explicit."""
        N = self.num_steps
        so = self.solver_order
        if self.lower_order_final:
            p_pred = jnp.minimum(jnp.minimum(so, N - i), i + 1)
            p_corr = jnp.minimum(jnp.minimum(so, N - i + 1), i)
        else:
            p_pred = jnp.minimum(so, i + 1)
            p_corr = jnp.minimum(so, i)
        return p_pred, p_corr

    # -- the step -------------------------------------------------------------

    def step(
        self,
        model_output: jnp.ndarray,
        i: jnp.ndarray,                 # scan counter 0..num_steps-1 (traced ok)
        sample: jnp.ndarray,
        state: UniPCState,
    ) -> Tuple[jnp.ndarray, UniPCState]:
        lam, alp, sig = self._lambda, self._alpha, self._sigma
        i = jnp.asarray(i, dtype=jnp.int32)
        im1 = jnp.maximum(i - 1, 0)
        im2 = jnp.maximum(i - 2, 0)
        im3 = jnp.maximum(i - 3, 0)

        x0 = self._convert_to_x0(model_output, sample, i)
        m0 = state.model_outputs[-1]   # x0 from step i-1
        m1 = state.model_outputs[-2]   # x0 from step i-2
        m2 = state.model_outputs[-3]   # x0 from step i-3

        p_pred, p_corr = self._effective_orders(i)

        # ---- corrector (uni_c) on the incoming sample, active for i >= 1.
        # Interval: s0 = step i-1 -> t = step i.
        h_c = lam[i] - lam[im1]
        b0_c, b1_c, b2_c, h_phi_1_c, B_h_c = self._bh_coeffs(-h_c)

        r1_c = (lam[im2] - lam[im1]) / _safe(h_c)
        r2_c = (lam[im3] - lam[im1]) / _safe(h_c)
        D1c_0 = (m1 - m0) / _safe(r1_c)
        D1c_1 = (m2 - m0) / _safe(r2_c)
        D1_t = x0 - m0

        # rhos candidates per corrector order (rhos_c = solve(R, b), :700-703;
        # order 1 uses the simplified [0.5]):
        #   p=1: (0, 0, 1/2)
        #   p=2: solve [[1,1],[r1,1]] -> closed form
        #   p=3: solve [[1,1,1],[r1,r2,1],[r1^2,r2^2,1]] -> Cramer
        det2_c = _safe(1.0 - r1_c)
        rho0_c2 = (b0_c - b1_c) / det2_c
        rhot_c2 = (b1_c - r1_c * b0_c) / det2_c

        q1, q2 = r1_c * r1_c, r2_c * r2_c
        det3 = _safe(_det3(1.0, 1.0, 1.0, r1_c, r2_c, 1.0, q1, q2, 1.0))
        rho0_c3 = _det3(b0_c, 1.0, 1.0, b1_c, r2_c, 1.0, b2_c, q2, 1.0) / det3
        rho1_c3 = _det3(1.0, b0_c, 1.0, r1_c, b1_c, 1.0, q1, b2_c, 1.0) / det3
        rhot_c3 = _det3(1.0, 1.0, b0_c, r1_c, r2_c, b1_c, q1, q2, b2_c) / det3

        rho0 = jnp.where(p_corr >= 3, rho0_c3, jnp.where(p_corr == 2, rho0_c2, 0.0))
        rho1 = jnp.where(p_corr >= 3, rho1_c3, 0.0)
        rhot = jnp.where(p_corr >= 3, rhot_c3, jnp.where(p_corr == 2, rhot_c2, 0.5))

        x_corr_base = (
            sig[i] / sig[im1] * state.last_sample - alp[i] * h_phi_1_c * m0
        )
        corrected = x_corr_base - alp[i] * B_h_c * (
            rho0 * D1c_0 + rho1 * D1c_1 + rhot * D1_t
        )
        sample_f = jnp.where(i >= 1, corrected, sample.astype(jnp.float32))

        # ---- history shift
        new_outputs = jnp.stack([m1, m0, x0])

        # ---- predictor (uni_p): step i -> i+1.  Order p uses b[:p-1] and the
        # (p-1)x(p-1) top-left solve (:558-561); order 2 uses the simplified
        # rhos_p = [0.5].
        h_p = lam[i + 1] - lam[i]
        b0_p, b1_p, _, h_phi_1_p, B_h_p = self._bh_coeffs(-h_p)

        r1_p = (lam[im1] - lam[i]) / _safe(h_p)
        r2_p = (lam[im2] - lam[i]) / _safe(h_p)
        D1p_0 = (m0 - x0) / _safe(r1_p)
        D1p_1 = (m1 - x0) / _safe(r2_p)

        det_p3 = _safe(r2_p - r1_p)
        rho0_p3 = (b0_p * r2_p - b1_p) / det_p3
        rho1_p3 = (b1_p - b0_p * r1_p) / det_p3

        rho0_p = jnp.where(p_pred >= 3, rho0_p3, jnp.where(p_pred == 2, 0.5, 0.0))
        rho1_p = jnp.where(p_pred >= 3, rho1_p3, 0.0)

        x_pred_base = sig[i + 1] / sig[i] * sample_f - alp[i + 1] * h_phi_1_p * x0
        prev_sample = x_pred_base - alp[i + 1] * B_h_p * (
            rho0_p * D1p_0 + rho1_p * D1p_1
        )

        new_state = UniPCState(model_outputs=new_outputs, last_sample=sample_f)
        return prev_sample.astype(sample.dtype), new_state
