"""Tiny-config model tests (pattern: reference tests/models/test_modeling_common.py:198
ModelTesterMixin — shapes, determinism, and the BrushNet identity-at-init property)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflecting_reality_tpu.models.brushnet import BrushNetModel, init_params_from_unet
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL, DiagonalGaussian
from reflecting_reality_tpu.models.clip_text import CLIPTextModel

TINY_UNET = dict(
    sample_size=16,
    block_out_channels=(8, 16, 16, 16),
    attention_head_dim=2,
    cross_attention_dim=16,
    norm_num_groups=4,
    layers_per_block=2,
)


def make_unet():
    unet = UNet2DConditionModel(**TINY_UNET)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([1, 2])
    ehs = jnp.zeros((2, 7, 16))
    params = unet.init(rng, sample, t, ehs)
    return unet, params


def make_brushnet(cond_ch=5):
    cfg = dict(TINY_UNET)
    cfg.pop("sample_size")
    bn = BrushNetModel(conditioning_channels=cond_ch, **cfg)
    rng = jax.random.PRNGKey(1)
    sample = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([1, 2])
    ehs = jnp.zeros((2, 7, 16))
    cond = jnp.zeros((2, 16, 16, cond_ch))
    params = bn.init(rng, sample, t, ehs, cond)
    return bn, params


class TestUNet:
    def test_output_shape_and_determinism(self):
        unet, params = make_unet()
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
        t = jnp.array([10, 500])
        ehs = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 16))
        fwd = jax.jit(lambda p, x, t, e: unet.apply(p, x, t, e))
        y1 = fwd(params, x, t, ehs)
        y2 = fwd(params, x, t, ehs)
        assert y1.shape == (2, 16, 16, 4)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        assert np.isfinite(np.asarray(y1)).all()


class TestBrushNet:
    def test_residual_counts_and_shapes(self):
        bn, params = make_brushnet()
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
        t = jnp.array([10, 500])
        ehs = jnp.zeros((2, 7, 16))
        cond = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 5))
        down, mid, up = bn.apply(params, x, t, ehs, cond)
        # SD-1.5 shape: 1 + (2+1)*3 + 2 = 12 down, 1 mid, (3+1)*3 + 3 = 15 up
        assert len(down) == 12
        assert len(up) == 15
        assert mid.shape[-1] == 16

    def test_zero_conv_identity_at_init(self):
        """At init all 28 residuals are exactly zero, so injecting them leaves
        the base UNet output unchanged (reference zero_module contract,
        models/brushnet.py:928)."""
        unet, uparams = make_unet()
        bn, bparams = make_brushnet()
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
        t = jnp.array([10, 500])
        ehs = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 16))
        cond = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 5))

        down, mid, up = bn.apply(bparams, x, t, ehs, cond)
        for r in down + [mid] + up:
            assert float(jnp.abs(r).max()) == 0.0

        y_plain = unet.apply(uparams, x, t, ehs)
        y_injected = unet.apply(
            uparams, x, t, ehs,
            down_block_add_samples=down, mid_block_add_sample=mid, up_block_add_samples=up,
        )
        np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_injected), atol=0)

    def test_global_pool_conditions(self):
        """global_pool_conditions mean-pools every residual over its spatial
        dims and bypasses the guess-mode logspace (reference
        models/brushnet.py:895-916); the pooled (B,1,1,C) residuals still
        broadcast through the unet injections."""
        cfg = dict(TINY_UNET)
        cfg.pop("sample_size")
        bn = BrushNetModel(conditioning_channels=5, **cfg)
        pooled_bn = BrushNetModel(conditioning_channels=5,
                                  global_pool_conditions=True, **cfg)
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
        t = jnp.array([10, 500])
        ehs = jnp.zeros((2, 7, 16))
        cond = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 5))
        params = bn.init(rng, x, t, ehs, cond)
        # perturb the zero convs so residuals are non-trivial
        params = jax.tree_util.tree_map(
            lambda a: a + 0.01 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape),
            params)

        down, mid, up = bn.apply(params, x, t, ehs, cond, guess_mode=True)
        pdown, pmid, pup = pooled_bn.apply(params, x, t, ehs, cond,
                                           guess_mode=True)
        for full, pooled in zip(down + [mid] + up, pdown + [pmid] + pup):
            assert pooled.shape == (2, 1, 1, full.shape[-1])
        # pooling applies AFTER plain (non-logspace) scaling: pooled residual
        # == spatial mean of the plain-scaled forward
        d0, m0, u0 = bn.apply(params, x, t, ehs, cond, guess_mode=False)
        for plain, pooled in zip(d0 + [m0] + u0, pdown + [pmid] + pup):
            np.testing.assert_allclose(
                np.asarray(jnp.mean(plain, axis=(1, 2), keepdims=True)),
                np.asarray(pooled), rtol=1e-5, atol=1e-6)
        # broadcast through the unet injections
        unet, uparams = make_unet()
        y = unet.apply(uparams, x, t, ehs, down_block_add_samples=pdown,
                       mid_block_add_sample=pmid, up_block_add_samples=pup)
        assert y.shape == (2, 16, 16, 4)
        assert np.isfinite(np.asarray(y)).all()

    def test_injection_count_contract(self):
        """UNet consumes exactly 12+1+15 samples; wrong count must fail loudly."""
        unet, uparams = make_unet()
        bn, bparams = make_brushnet()
        x = jnp.zeros((2, 16, 16, 4))
        t = jnp.array([1, 2])
        ehs = jnp.zeros((2, 7, 16))
        cond = jnp.zeros((2, 16, 16, 5))
        down, mid, up = bn.apply(bparams, x, t, ehs, cond)
        with pytest.raises(Exception):
            unet.apply(
                uparams, x, t, ehs,
                down_block_add_samples=down[:-1], mid_block_add_sample=mid,
                up_block_add_samples=up,
            )

    def test_from_unet_surgery(self):
        unet, uparams = make_unet()
        bn, bparams = make_brushnet()
        surgered = init_params_from_unet(bparams["params"], uparams["params"])
        # conv_in duplicated into channels 0:4 and 4:8
        k = np.asarray(surgered["conv_in_condition"]["kernel"])
        src = np.asarray(uparams["params"]["conv_in"]["kernel"])
        np.testing.assert_array_equal(k[:, :, 0:4, :], src)
        np.testing.assert_array_equal(k[:, :, 4:8, :], src)
        np.testing.assert_array_equal(k[:, :, 8:, :], 0)
        # time embedding copied
        np.testing.assert_array_equal(
            np.asarray(surgered["time_embedding"]["linear_1"]["kernel"]),
            np.asarray(uparams["params"]["time_embedding"]["linear_1"]["kernel"]),
        )
        # a down-block resnet conv copied
        np.testing.assert_array_equal(
            np.asarray(surgered["down_blocks_0"]["resnets_0"]["conv1"]["kernel"]),
            np.asarray(uparams["params"]["down_blocks_0"]["resnets_0"]["conv1"]["kernel"]),
        )
        # zero convs remain zero
        assert float(np.abs(np.asarray(surgered["brushnet_mid_block"]["kernel"])).max()) == 0.0


class TestVAE:
    def test_roundtrip_shapes(self):
        vae = AutoencoderKL(
            block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
            norm_num_groups=4,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
        params = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
        posterior = vae.apply(params, x, method=vae.encode)
        assert posterior.mean.shape == (1, 16, 16, 4)
        z = posterior.sample(jax.random.PRNGKey(3))
        y = vae.apply(params, z, method=vae.decode)
        assert y.shape == (1, 32, 32, 3)

    def test_diagonal_gaussian_logvar_clamp(self):
        moments = jnp.concatenate(
            [jnp.zeros((1, 2, 2, 4)), jnp.full((1, 2, 2, 4), 100.0)], axis=-1
        )
        g = DiagonalGaussian.from_moments(moments)
        assert float(g.logvar.max()) == 20.0


class TestCLIPText:
    def test_shapes_and_causality(self):
        model = CLIPTextModel(
            vocab_size=100, hidden_size=16, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=32, max_position_embeddings=8,
        )
        ids = jnp.array([[1, 2, 3, 4, 5, 6, 7, 0]])
        params = model.init(jax.random.PRNGKey(0), ids)
        out = model.apply(params, ids)
        assert out.shape == (1, 8, 16)
        # causality: changing a later token must not affect earlier positions
        ids2 = ids.at[0, 5].set(9)
        out2 = model.apply(params, ids2)
        np.testing.assert_allclose(np.asarray(out[:, :5]), np.asarray(out2[:, :5]), atol=1e-5)
        assert not np.allclose(np.asarray(out[:, 5:]), np.asarray(out2[:, 5:]))
