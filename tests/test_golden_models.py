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


class TestIPAdapterTrainForwardParity:
    """Golden parity for the ip_adapter training forward (reference
    MirrorFusionModel.forward, train_brushnet_mirror.py:858-888): the same
    weights must reproduce the projected normal token AND the noise
    prediction through the decoupled to_k_ip/to_v_ip cross-attention
    (IPAttnProcessor2_0 num_tokens=4 split).  Goldens from
    tests/golden/generate_golden_ip.py."""

    GOLDEN_IP = os.path.join(os.path.dirname(__file__), "golden", "ip_adapter.npz")

    @pytest.fixture(scope="class")
    def ip_golden(self):
        if not os.path.exists(self.GOLDEN_IP):
            pytest.skip("ip golden data not generated")
        return np.load(self.GOLDEN_IP)

    def _unet_params(self, g):
        # torch keys carry ".processor." for the IP projections; the flax
        # Attention registers to_k_ip/to_v_ip directly on the module
        sd = {}
        for k in g.files:
            if not k.startswith("unet::"):
                continue
            sd[k.split("::", 1)[1].replace(".processor.", ".")] = g[k]
        return {"params": torch_to_flax_params(sd)}

    def test_normal_token_and_prediction(self, ip_golden):
        from reflecting_reality_tpu.models.ip_adapter import normal_tokens

        g = ip_golden
        proj_sd = {k.split("::", 1)[1]: g[k] for k in g.files if k.startswith("proj::")}
        proj_params = {"params": torch_to_flax_params(proj_sd)}
        tok = normal_tokens(jnp.asarray(g["normal"]), proj_params,
                            cross_attention_dim=16)
        np.testing.assert_allclose(np.asarray(tok), g["ip_tokens"],
                                   rtol=1e-4, atol=1e-5)

        bn = BrushNetModel(conditioning_channels=6, **TINY)
        bn_sd = {k.split("::", 1)[1]: g[k] for k in g.files if k.startswith("brushnet::")}
        bn_params = {"params": torch_to_flax_params(bn_sd)}
        sample = jnp.asarray(nhwc(g["sample"]))
        t = jnp.asarray(g["t"].astype(np.int32))
        ehs = jnp.asarray(g["ehs"])
        down, mid, up = bn.apply(bn_params, sample, t, ehs,
                                 jnp.asarray(nhwc(g["cond"])))

        unet = UNet2DConditionModel(sample_size=16, ip_num_tokens=4,
                                    ip_scale=1.0, **TINY)
        uparams = self._unet_params(g)
        unet_ehs = jnp.concatenate([ehs, tok.astype(ehs.dtype)], axis=1)
        pred = unet.apply(
            uparams, sample, t, unet_ehs,
            down_block_add_samples=down, mid_block_add_sample=mid,
            up_block_add_samples=up,
        )
        np.testing.assert_allclose(nchw(pred), g["pred"], rtol=1e-4, atol=2e-5)

    def test_prediction_sensitive_to_normal(self, ip_golden):
        """Flipping the mirror normal must change the prediction (the ip
        path is live, not a dead branch)."""
        from reflecting_reality_tpu.models.ip_adapter import normal_tokens

        g = ip_golden
        proj_sd = {k.split("::", 1)[1]: g[k] for k in g.files if k.startswith("proj::")}
        proj_params = {"params": torch_to_flax_params(proj_sd)}
        unet = UNet2DConditionModel(sample_size=16, ip_num_tokens=4,
                                    ip_scale=1.0, **TINY)
        uparams = self._unet_params(g)
        sample = jnp.asarray(nhwc(g["sample"]))
        t = jnp.asarray(g["t"].astype(np.int32))
        ehs = jnp.asarray(g["ehs"])

        def run(normal):
            tok = normal_tokens(jnp.asarray(normal), proj_params, cross_attention_dim=16)
            return unet.apply(
                uparams, sample, t,
                jnp.concatenate([ehs, tok.astype(ehs.dtype)], axis=1),
            )
        a = run(g["normal"])
        b = run(-g["normal"])
        assert float(jnp.abs(a - b).max()) > 1e-4
