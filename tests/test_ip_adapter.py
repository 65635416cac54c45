"""IP-Adapter normals-conditioning tests: freq encoding, decoupled attention
split semantics, and the partial-freeze training path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflecting_reality_tpu.models.ip_adapter import (
    DEFAULT_NUM_TOKENS,
    NORMALS_EMBED_DIM,
    NormalProjModel,
    freq_encode,
    init_ip_params_from_unet,
    is_ip_param_path,
)
from reflecting_reality_tpu.ops.attention import Attention


class TestFreqEncode:
    def test_shape_and_values(self):
        x = jnp.asarray([[[0.0, 1.0, -1.0]]])  # (1, 1, 3)
        out = freq_encode(x)
        assert out.shape == (1, 1, NORMALS_EMBED_DIM)
        # first band freq = 2^0 = 1: sin(x), cos(x)
        np.testing.assert_allclose(np.asarray(out[0, 0, :3]), np.sin([0, 1, -1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0, 0, 3:6]), np.cos([0, 1, -1]), atol=1e-6)

    def test_proj_model(self):
        proj = NormalProjModel(cross_attention_dim=32)
        p = proj.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, NORMALS_EMBED_DIM)))
        tok = proj.apply(p, freq_encode(jnp.ones((2, 1, 3))))
        assert tok.shape == (2, 1, 32)
        assert "proj_0" in p["params"]


class TestIPAttention:
    def test_scale_zero_equals_truncated_context(self):
        """With ip_scale=0 the ip tokens must contribute nothing: output ==
        plain attention over context[:-num_tokens]."""
        attn_ip = Attention(query_dim=16, heads=2, dim_head=8,
                            cross_attention_dim=16, ip_num_tokens=DEFAULT_NUM_TOKENS,
                            ip_scale=0.0)
        attn_plain = Attention(query_dim=16, heads=2, dim_head=8,
                               cross_attention_dim=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 10, 16))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 16))
        p_ip = attn_ip.init(jax.random.PRNGKey(2), x, ctx)
        # plain attention shares the non-ip weights
        p_plain = {"params": {k: v for k, v in p_ip["params"].items()
                              if k not in ("to_k_ip", "to_v_ip")}}
        out_ip = attn_ip.apply(p_ip, x, ctx)
        out_plain = attn_plain.apply(p_plain, x, ctx[:, :-DEFAULT_NUM_TOKENS])
        np.testing.assert_allclose(np.asarray(out_ip), np.asarray(out_plain),
                                   rtol=1e-5, atol=1e-6)

    def test_ip_contribution_nonzero(self):
        attn_ip = Attention(query_dim=16, heads=2, dim_head=8,
                            cross_attention_dim=16, ip_num_tokens=4, ip_scale=1.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 10, 16))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 16))
        p = attn_ip.init(jax.random.PRNGKey(2), x, ctx)
        a = attn_ip.apply(p, x, ctx)
        b = attn_ip.bind(p)  # scale applied at module level, so rebuild with 0
        attn0 = Attention(query_dim=16, heads=2, dim_head=8,
                          cross_attention_dim=16, ip_num_tokens=4, ip_scale=0.0)
        c = attn0.apply(p, x, ctx)
        assert float(jnp.abs(a - c).max()) > 1e-4


class TestSurgeryAndMask:
    def test_init_ip_params_copies_twins(self):
        src = {"attn2": {"to_k": {"kernel": np.ones((4, 4))},
                         "to_v": {"kernel": np.full((4, 4), 2.0)},
                         "to_q": {"kernel": np.zeros((4, 4))}}}
        dst = {"attn2": {"to_k": {"kernel": np.zeros((4, 4))},
                         "to_v": {"kernel": np.zeros((4, 4))},
                         "to_q": {"kernel": np.ones((4, 4))},
                         "to_k_ip": {"kernel": np.zeros((4, 4))},
                         "to_v_ip": {"kernel": np.zeros((4, 4))}}}
        out = init_ip_params_from_unet(dst, src)
        np.testing.assert_array_equal(out["attn2"]["to_k_ip"]["kernel"], 1.0)
        np.testing.assert_array_equal(out["attn2"]["to_v_ip"]["kernel"], 2.0)
        np.testing.assert_array_equal(out["attn2"]["to_k"]["kernel"], 1.0)

    def test_is_ip_param_path(self):
        assert is_ip_param_path(("down_blocks_0", "attentions_0", "to_k_ip", "kernel"))
        assert not is_ip_param_path(("down_blocks_0", "attentions_0", "to_k", "kernel"))


class TestIPTraining:
    @pytest.mark.medium
    def test_partial_freeze(self):
        """ip mode, train_base_unet=False: to_k_ip/to_v_ip and normal_proj
        update; all other unet leaves stay frozen."""
        from tests.test_training import BCFG, CFG, H, W, batch_of
        from reflecting_reality_tpu.models.brushnet import BrushNetModel
        from reflecting_reality_tpu.models.clip_text import CLIPTextModel
        from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
        from reflecting_reality_tpu.models.vae import AutoencoderKL
        from reflecting_reality_tpu.training.train_step import TrainConfig, make_train_step

        unet = UNet2DConditionModel(sample_size=2, ip_num_tokens=DEFAULT_NUM_TOKENS, **CFG)
        brushnet = BrushNetModel(conditioning_channels=6, **BCFG)
        vae = AutoencoderKL(block_out_channels=(4, 4, 4, 4), norm_num_groups=2)
        text = CLIPTextModel(vocab_size=100, hidden_size=16, num_hidden_layers=1,
                             num_attention_heads=2, intermediate_size=32)
        proj = NormalProjModel(cross_attention_dim=16)

        r = jax.random.split(jax.random.PRNGKey(0), 5)
        sample = jnp.zeros((1, 2, 2, 4))
        t = jnp.array([1])
        ehs = jnp.zeros((1, 8, 16))  # 7 text + 1 normal token
        uparams = unet.init(r[0], sample, t, ehs)
        bparams = brushnet.init(r[1], sample, t, jnp.zeros((1, 7, 16)),
                                jnp.zeros((1, 2, 2, 6)))
        vparams = vae.init(r[2], jnp.zeros((1, H, W, 3)), jax.random.PRNGKey(9))
        tparams = text.init(r[3], jnp.zeros((1, 7), jnp.int32))
        pparams = proj.init(r[4], jnp.zeros((1, 1, NORMALS_EMBED_DIM)))

        config = TrainConfig(
            learning_rate=1e-3, lr_warmup_steps=0, max_train_steps=10,
            normals_conditioning_mode="ip_adapter", train_base_unet=False,
        )
        step_fn, init_state = make_train_step(unet, brushnet, vae, text, config)
        state = init_state(bparams, uparams, vparams, tparams,
                           normal_proj_params=pparams)

        batch = batch_of(2)
        batch["normals"] = jnp.asarray(
            np.tile([[0.0, 0.0, 1.0]], (2, 1)).reshape(2, 1, 3), jnp.float32
        )
        s1, m = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))

        flat0 = jax.tree_util.tree_flatten_with_path(state.trainable["unet"])[0]
        flat1 = jax.tree_util.tree_flatten_with_path(s1.trainable["unet"])[0]
        ip_moved = other_moved = 0.0
        for (kp0, v0), (_, v1) in zip(flat0, flat1):
            path = tuple(getattr(k, "key", str(k)) for k in kp0)
            d = float(jnp.abs(v1 - v0).max())
            if is_ip_param_path(path):
                ip_moved = max(ip_moved, d)
            else:
                other_moved = max(other_moved, d)
        assert ip_moved > 0, "ip weights must train"
        assert other_moved == 0.0, "base unet must stay frozen"
        # normal_proj trains too
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.trainable["normal_proj"], s1.trainable["normal_proj"],
        )
        assert max(jax.tree_util.tree_leaves(d)) > 0
