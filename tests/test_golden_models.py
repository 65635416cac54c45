"""Model-level golden parity vs the reference torch implementation: the same
weights (converted via core.io.torch_to_flax_params) and inputs must produce
the same BrushNet residual stacks, injected UNet output, and VAE round trip.

This is the strongest correctness evidence in the suite — it pins the
28-residual injection bookkeeping, the from_unet block semantics, attention
math, GroupNorm statistics, and the weight-layout conversion all at once.
Goldens come from tests/golden/generate_golden_models.py."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from reflecting_reality_tpu.core.io import torch_to_flax_params
from reflecting_reality_tpu.models.brushnet import BrushNetModel
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "models.npz")

TINY = dict(
    block_out_channels=(8, 16, 16, 16),
    attention_head_dim=2,
    cross_attention_dim=16,
    norm_num_groups=4,
    layers_per_block=2,
)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden model data not generated")
    return np.load(GOLDEN)


def weights_of(golden, prefix):
    sd = {k.split("::", 1)[1]: golden[k] for k in golden.files
          if k.startswith(prefix + "::")}
    return {"params": torch_to_flax_params(sd)}


def nhwc(x):  # golden arrays are NCHW
    return np.moveaxis(x, 1, -1)


def nchw(x):
    return np.moveaxis(np.asarray(x), -1, 1)


@pytest.fixture(scope="module")
def inputs(golden):
    return (
        jnp.asarray(nhwc(golden["sample"])),
        jnp.asarray(golden["t"].astype(np.int32)),
        jnp.asarray(golden["ehs"]),
        jnp.asarray(nhwc(golden["cond"])),
    )


class TestBrushNetParity:
    def test_residual_stacks(self, golden, inputs):
        sample, t, ehs, cond = inputs
        bn = BrushNetModel(conditioning_channels=6, **TINY)
        params = weights_of(golden, "brushnet")
        down, mid, up = bn.apply(params, sample, t, ehs, cond,
                                 conditioning_scale=0.8)
        assert len(down) == int(golden["n_down"])
        assert len(up) == int(golden["n_up"])
        np.testing.assert_allclose(
            nchw(mid), golden["brushnet_mid"], rtol=1e-4, atol=1e-5
        )
        for i, d in enumerate(down):
            np.testing.assert_allclose(
                nchw(d), golden[f"brushnet_down_{i}"], rtol=1e-4, atol=1e-5,
                err_msg=f"down[{i}]",
            )
        for i, u in enumerate(up):
            np.testing.assert_allclose(
                nchw(u), golden[f"brushnet_up_{i}"], rtol=1e-4, atol=1e-5,
                err_msg=f"up[{i}]",
            )


class TestUNetParity:
    def test_plain_forward(self, golden, inputs):
        sample, t, ehs, _ = inputs
        unet = UNet2DConditionModel(sample_size=16, **TINY)
        params = weights_of(golden, "unet")
        out = unet.apply(params, sample, t, ehs)
        np.testing.assert_allclose(
            nchw(out), golden["unet_plain"], rtol=1e-4, atol=1e-5
        )

    def test_injected_forward(self, golden, inputs):
        """End-to-end dual branch: our brushnet residuals into our unet must
        equal the reference's composite output."""
        sample, t, ehs, cond = inputs
        bn = BrushNetModel(conditioning_channels=6, **TINY)
        unet = UNet2DConditionModel(sample_size=16, **TINY)
        down, mid, up = bn.apply(weights_of(golden, "brushnet"),
                                 sample, t, ehs, cond, conditioning_scale=0.8)
        out = unet.apply(
            weights_of(golden, "unet"), sample, t, ehs,
            down_block_add_samples=down, mid_block_add_sample=mid,
            up_block_add_samples=up,
        )
        np.testing.assert_allclose(
            nchw(out), golden["unet_out"], rtol=1e-4, atol=1e-5
        )


class TestVAEParity:
    def test_encode_decode(self, golden):
        vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8),
                            norm_num_groups=4, layers_per_block=1)
        params = weights_of(golden, "vae")
        img = jnp.asarray(nhwc(golden["img"]))
        dist = vae.apply(params, img, method=vae.encode)
        np.testing.assert_allclose(
            nchw(dist.mode), golden["vae_mode"], rtol=1e-4, atol=1e-5
        )
        dec = vae.apply(params, jnp.asarray(nhwc(golden["vae_mode"])),
                        method=vae.decode)
        np.testing.assert_allclose(
            nchw(dec), golden["vae_decoded"], rtol=1e-4, atol=1e-5
        )
