"""W8A8 int8 serving mode (ops/quant.py + pipe.enable_int8).

Pins: per-channel weight quantization math, the selection/exclusion policy,
the interceptor's exact reproduction of nn.Conv/nn.Dense semantics (strides,
padding variants, bias, dtype) against fake-quantized float references, and
the end-to-end pipeline behavior (determinism, closeness to the exact path,
composition with DeepCache and per-step dispatch).

No reference analogue (the reference's nearest knob is torch_dtype=fp16,
pipeline_brushnet.py); this is a TPU-native opt-in approximation mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from reflecting_reality_tpu.ops.quant import (
    DEFAULT_EXCLUDE,
    QKERNEL,
    QSCALE,
    default_select,
    quantize_kernel,
    quantize_params,
    quantized_apply,
)

ALL = lambda k: k.ndim in (2, 4)


class TestQuantizeKernel:
    def test_per_channel_scales_and_error_bound(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 16, 8)) * jnp.arange(1, 9)
        wq, scale = quantize_kernel(w)
        assert wq.dtype == jnp.int8 and scale.shape == (8,)
        np.testing.assert_allclose(
            np.asarray(scale), np.abs(np.asarray(w)).max(axis=(0, 1, 2)) / 127.0,
            rtol=1e-6,
        )
        # dequantization error bounded by scale/2 per element
        err = np.abs(np.asarray(wq, np.float32) * np.asarray(scale) - np.asarray(w))
        assert (err <= np.asarray(scale) / 2 + 1e-7).all()
        assert np.abs(np.asarray(wq)).max() <= 127

    def test_zero_channel_is_safe(self):
        w = jnp.zeros((1, 1, 32, 4))
        wq, scale = quantize_kernel(w)
        assert np.asarray(wq).max() == 0 and np.isfinite(np.asarray(scale)).all()


class TestQuantizeParams:
    def test_selection_and_exclusion(self):
        big2 = jnp.ones((512, 128))
        big4 = jnp.ones((3, 3, 64, 128))
        small = jnp.ones((8, 8))
        tree = {
            "conv": {"kernel": big4, "bias": jnp.zeros(128)},
            "dense": {"kernel": big2},
            "tiny": {"kernel": small},
            "time_embedding": {"linear_1": {"kernel": big2}},
            "blocks": {"time_emb_proj": {"kernel": big2}},
        }
        new, n = quantize_params(tree)
        assert n == 2  # conv + dense; tiny too small; time_* excluded
        assert QKERNEL in new["conv"] and "kernel" not in new["conv"]
        assert "bias" in new["conv"]
        assert QKERNEL in new["dense"]
        assert "kernel" in new["tiny"]
        assert "kernel" in new["time_embedding"]["linear_1"]
        assert "kernel" in new["blocks"]["time_emb_proj"]

    def test_default_select_policy(self):
        assert default_select(jnp.ones((3, 3, 320, 320)))       # trunk conv
        assert default_select(jnp.ones((320, 2560)))            # GEGLU proj
        assert not default_select(jnp.ones((3, 3, 4, 320)))     # conv_in
        assert not default_select(jnp.ones((3, 3, 320, 4)))     # conv_out
        assert not default_select(jnp.ones((77,)))              # not a matmul


def _fake_quant_reference(module, params, x):
    """Float forward on fake-quantized weights + fake-quantized input —
    the semantics the interceptor must reproduce (up to f32 accumulation
    rounding: the int32 path is exact, the float path rounds per-add)."""
    kernel = params["params"]["kernel"]
    wq, s_w = quantize_kernel(kernel)
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.abs(xf).max(), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127)
    fq_params = dict(params["params"])
    fq_params["kernel"] = (wq.astype(jnp.float32) * s_w).astype(kernel.dtype)
    return module.apply({"params": fq_params}, (xq * s_x).astype(x.dtype))


class TestInterceptorSemantics:
    @pytest.mark.parametrize(
        "conv_kwargs",
        [
            dict(padding=((1, 1), (1, 1))),
            dict(padding="SAME", strides=(2, 2)),
            dict(padding=((0, 0), (0, 0))),
            dict(padding=1, use_bias=False),
        ],
    )
    def test_conv_matches_fake_quant(self, conv_kwargs):
        m = nn.Conv(24, (3, 3), dtype=jnp.float32, **conv_kwargs)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 12))
        p = m.init(jax.random.PRNGKey(1), x)
        ref = _fake_quant_reference(m, p, x)
        qp, n = quantize_params(p["params"], select=ALL)
        assert n == 1
        out = quantized_apply(m, {"params": qp}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_dense_matches_fake_quant(self):
        m = nn.Dense(48, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
        p = m.init(jax.random.PRNGKey(1), x)
        ref = _fake_quant_reference(m, p, x)
        qp, _ = quantize_params(p["params"], select=ALL)
        out = quantized_apply(m, {"params": qp}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_unquantized_tree_is_noop(self):
        m = nn.Dense(16)
        x = jnp.ones((2, 8))
        p = m.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(
            np.asarray(quantized_apply(m, p, x)), np.asarray(m.apply(p, x))
        )

    def test_quantized_tree_without_interceptor_fails_loudly(self):
        m = nn.Dense(16)
        x = jnp.ones((2, 300))
        p = m.init(jax.random.PRNGKey(0), x)
        qp, _ = quantize_params(p["params"], select=ALL)
        with pytest.raises(Exception):
            m.apply({"params": qp}, x)

    def test_bf16_module_dtype(self):
        m = nn.Conv(24, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 12))
        p = m.init(jax.random.PRNGKey(1), x)
        qp, _ = quantize_params(p["params"], select=ALL)
        out = quantized_apply(m, {"params": qp}, x)
        assert out.dtype == jnp.bfloat16


class TestAttentionProjections:
    """to_q/to_k/to_v are parameter-only _Proj modules fused at trace time;
    ops.attention handles their quantized form directly (fused int8 GEMM
    with concatenated per-out-channel scales)."""

    def _fake_quant_attention(self, attn, params, x, context=None):
        """Float attention on fake-quantized q/k/v kernels and fake-quantized
        projection inputs — the semantics the int8 path must reproduce."""
        def fq_act(t):
            s = jnp.maximum(jnp.abs(t.astype(jnp.float32)).max(), 1e-12) / 127.0
            return (jnp.clip(jnp.round(t / s), -127, 127) * s).astype(t.dtype)

        fq = {"params": jax.tree_util.tree_map(lambda x: x, dict(params["params"]))}
        for name in ("to_q", "to_k", "to_v"):
            k = fq["params"][name]["kernel"]
            wq, s = quantize_kernel(k)
            fq["params"][name]["kernel"] = (wq.astype(jnp.float32) * s).astype(k.dtype)
        args = (fq_act(x),) + ((fq_act(context),) if context is not None else ())
        return attn.apply(fq, *args)

    def test_self_attention_fused_int8(self):
        from reflecting_reality_tpu.ops.attention import Attention

        attn = Attention(query_dim=32, heads=2, dim_head=16, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32))
        p = attn.init(jax.random.PRNGKey(1), x)
        qp, n = quantize_params(p["params"], select=ALL, exclude=("to_out_0",))
        assert n == 3
        out = quantized_apply(attn, {"params": qp}, x)
        ref = self._fake_quant_attention(attn, p, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_cross_attention_fused_int8(self):
        from reflecting_reality_tpu.ops.attention import Attention

        attn = Attention(query_dim=32, heads=2, dim_head=16,
                         cross_attention_dim=48, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 48))
        p = attn.init(jax.random.PRNGKey(1), x, ctx)
        qp, n = quantize_params(p["params"], select=ALL, exclude=("to_out_0",))
        assert n == 3
        out = quantized_apply(attn, {"params": qp}, x, ctx)
        ref = self._fake_quant_attention(attn, p, x, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_mixed_selection_falls_back_to_unfused(self):
        """Only to_q quantized: fusion is impossible, the per-projection path
        must still produce finite, close-to-float results."""
        from reflecting_reality_tpu.ops.attention import Attention

        attn = Attention(query_dim=32, heads=2, dim_head=16, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32))
        p = attn.init(jax.random.PRNGKey(1), x)
        qp, n = quantize_params(
            p["params"], select=ALL, exclude=("to_k", "to_v", "to_out_0"),
        )
        assert n == 1
        out = quantized_apply(attn, {"params": qp}, x)
        ref = attn.apply(p, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0.1, atol=0.1)

    def test_grad_still_flows_unquantized(self):
        """The _Proj early-return must not disturb the exact/training path."""
        from reflecting_reality_tpu.ops.attention import Attention

        attn = Attention(query_dim=32, heads=2, dim_head=16, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
        p = attn.init(jax.random.PRNGKey(1), x)
        g = jax.grad(lambda pp: attn.apply(pp, x).sum())(p)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def _tiny_pipe():
    from reflecting_reality_tpu.data.tokenizer import HashTokenizer
    from reflecting_reality_tpu.models.brushnet import BrushNetModel
    from reflecting_reality_tpu.models.clip_text import CLIPTextModel
    from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
    from reflecting_reality_tpu.models.vae import AutoencoderKL
    from reflecting_reality_tpu.pipelines.brushnet_pipeline import (
        StableDiffusionBrushNetPipeline,
    )

    cfg = dict(
        block_out_channels=(8, 16, 16, 16),
        attention_head_dim=2,
        cross_attention_dim=32,
        norm_num_groups=4,
        layers_per_block=2,
    )
    unet = UNet2DConditionModel(sample_size=8, **cfg)
    brushnet = BrushNetModel(conditioning_channels=6, **cfg)
    vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), norm_num_groups=4)
    text = CLIPTextModel(vocab_size=1000, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64)
    rngs = jax.random.split(jax.random.PRNGKey(0), 4)
    sample = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([1])
    ehs = jnp.zeros((1, 77, 32))
    return StableDiffusionBrushNetPipeline(
        vae=(vae, vae.init(rngs[2], jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(9))),
        text_encoder=(text, text.init(rngs[3], jnp.zeros((1, 77), jnp.int32))),
        tokenizer=HashTokenizer(vocab_size=1000),
        unet=(unet, unet.init(rngs[0], sample, t, ehs)),
        brushnet=(brushnet, brushnet.init(rngs[1], sample, t, ehs,
                                          jnp.zeros((1, 8, 8, 6)))),
        depth_conditioning_mode="concat",
    )


def _inputs():
    rng = np.random.RandomState(0)
    image = rng.rand(64, 64, 3).astype(np.float32)
    mask = np.zeros((64, 64, 3), np.float32)
    mask[16:48, 16:48] = 1.0
    depth = rng.rand(64, 64, 1).astype(np.float32)
    return dict(prompt="a mirror", image=image, mask=mask, depth=depth,
                num_inference_steps=2, guidance_scale=7.5, seed=42)


class TestPipelineInt8:
    @pytest.mark.medium
    def test_e2e_close_to_exact_and_deterministic(self):
        pipe = _tiny_pipe()
        kwargs = _inputs()
        exact = pipe(**kwargs)
        pipe.enable_int8(select=ALL)
        q1 = pipe(**kwargs)
        q2 = pipe(**kwargs)
        np.testing.assert_array_equal(q1, q2)
        assert q1.shape == exact.shape and q1.dtype == np.uint8
        # approximation mode: outputs track the exact path closely even with
        # EVERY kernel quantized at this tiny config
        mad = np.abs(q1.astype(int) - exact.astype(int)).mean()
        assert mad < 16.0, mad

    def test_no_kernels_selected_raises(self):
        pipe = _tiny_pipe()
        with pytest.raises(ValueError):
            pipe.enable_int8()  # default policy selects nothing at tiny config

    @pytest.mark.medium
    def test_composes_with_deep_cache_and_per_step(self):
        pipe = _tiny_pipe()
        pipe.enable_int8(select=ALL)
        kwargs = _inputs()
        base = pipe(**kwargs)
        pipe.enable_deep_cache(2)
        dc = pipe(**kwargs)
        assert dc.shape == base.shape
        pipe.disable_deep_cache()
        ps = pipe(**kwargs, dispatch="per_step")
        mad = np.abs(ps.astype(int) - base.astype(int)).mean()
        assert mad < 2.0, mad  # same math, different dispatch
