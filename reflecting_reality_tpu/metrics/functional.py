"""Image metrics in jnp (reference reaches these via torchmetrics.functional,
metrics/metrics.py:196-209; semantics reproduced here so the whole eval sweep
can run batched on TPU).

Exact protocol target: torchmetrics==1.4.0.post0 (the reference's pin,
examples/brushnet/requirements.txt:19), functional API with default args —
the calls the reference makes are `peak_signal_noise_ratio(pred, gt)` and
`structural_similarity_index_measure(pred, gt)` with NO data_range:

- psnr: 10·log10(data_range² / mse); data_range=None resolves to the TARGET's
  max-min (torchmetrics 1.4 functional/image/psnr.py: `data_range =
  target.max() - target.min()`).  On near-constant crops (mask_* families)
  this is the observed target range, NOT 255 — matching the reference
  protocol exactly; tests/test_metrics.py pins this on a near-constant
  fixture against an independent numpy implementation.
- ssim: gaussian kernel 11, sigma 1.5, k1=0.01, k2=0.03; data_range=None
  resolves to max(range(pred), range(target)) (torchmetrics 1.4
  functional/image/ssim.py).  torchmetrics reflect-pads, convolves, then
  crops the pad back — arithmetically identical to the VALID depthwise conv
  used here; per-pixel maps averaged (reduction='elementwise_mean').
- iou: boolean intersection-over-union (metrics/metrics.py:184-189).

Inputs are NHWC or HWC arrays of any float/int range.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _nhwc(x):
    x = jnp.asarray(x, jnp.float32)
    return x[None] if x.ndim == 3 else x


def psnr(pred, target, data_range: float | None = None) -> jnp.ndarray:
    pred, target = _nhwc(pred), _nhwc(target)
    if data_range is None:
        data_range = jnp.max(target) - jnp.min(target)
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(
    pred,
    target,
    data_range: float | None = None,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    pred, target = _nhwc(pred), _nhwc(target)
    if data_range is None:
        data_range = jnp.maximum(
            jnp.max(pred) - jnp.min(pred), jnp.max(target) - jnp.min(target)
        )
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    kern = _gaussian_kernel(kernel_size, sigma)
    c = pred.shape[-1]
    # depthwise valid conv: feature_group_count = channels
    kern4 = jnp.broadcast_to(kern[:, :, None, None], (kernel_size, kernel_size, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kern4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_p, mu_t = filt(pred), filt(target)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sigma_p = filt(pred * pred) - mu_pp
    sigma_t = filt(target * target) - mu_tt
    sigma_pt = filt(pred * target) - mu_pt

    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sigma_p + sigma_t + c2)
    return jnp.mean(num / den)


def iou(gen_mask, gt_mask) -> float:
    gen = np.asarray(gen_mask).astype(bool)
    gt = np.asarray(gt_mask).astype(bool)
    union = np.logical_or(gen, gt).sum()
    if union == 0:
        return float("nan")
    return float(np.logical_and(gen, gt).sum() / union)


@functools.partial(jax.jit, static_argnames=())
def _psnr_ssim_pair(pred, target):
    return psnr(pred, target), ssim(pred, target)


def psnr_ssim(pred, target):
    """Jitted pair computation for the eval sweep hot path."""
    p, s = _psnr_ssim_pair(jnp.asarray(pred, jnp.float32), jnp.asarray(target, jnp.float32))
    return float(p), float(s)
