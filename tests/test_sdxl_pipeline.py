"""SDXL BrushNet pipeline smoke test at tiny config (dual text encoders,
text_time addition embeddings, per-block transformer depths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflecting_reality_tpu.data.tokenizer import HashTokenizer
from reflecting_reality_tpu.models.brushnet import BrushNetModel
from reflecting_reality_tpu.models.clip_text import CLIPTextModel, CLIPTextModelWithProjection
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL
from reflecting_reality_tpu.pipelines.brushnet_sdxl_pipeline import (
    StableDiffusionXLBrushNetPipeline,
)

H = W = 64


@pytest.fixture(scope="module")
def pipe():
    return _build_pipe()


def _build_pipe():
    # SDXL structure in miniature: 3 blocks, per-block transformer depths,
    # text_time micro-conditioning; cross dim = 8 + 16 = 24.
    cross = 24
    pooled = 16
    time_ids_dim = 4
    proj_in = pooled + 6 * time_ids_dim
    cfg = dict(
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16, 16),
        transformer_layers_per_block=(1, 1, 2),
        attention_head_dim=2,
        cross_attention_dim=cross,
        norm_num_groups=4,
        layers_per_block=2,
        addition_embed_type="text_time",
        addition_time_embed_dim=time_ids_dim,
        projection_class_embeddings_input_dim=proj_in,
    )
    unet = UNet2DConditionModel(sample_size=8, **cfg)
    bcfg = dict(cfg)
    bcfg.update(
        down_block_types=("DownBlock2D",) * 3,
        up_block_types=("UpBlock2D",) * 3,
        mid_block_type="MidBlock2D",
    )
    brushnet = BrushNetModel(conditioning_channels=6, **bcfg)
    vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), norm_num_groups=4)
    text1 = CLIPTextModel(vocab_size=1000, hidden_size=8, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=16)
    text2 = CLIPTextModelWithProjection(
        vocab_size=1000, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, projection_dim=pooled,
        eos_token_id=999,
    )
    r = jax.random.split(jax.random.PRNGKey(0), 5)
    sample = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([1])
    ehs = jnp.zeros((1, 77, cross))
    added = {"text_embeds": jnp.zeros((1, pooled)), "time_ids": jnp.zeros((1, 6))}
    uparams = unet.init(r[0], sample, t, ehs, added_cond_kwargs=added)
    bparams = brushnet.init(r[1], sample, t, ehs, jnp.zeros((1, 8, 8, 6)),
                            added_cond_kwargs=added)
    vparams = vae.init(r[2], jnp.zeros((1, H, W, 3)), jax.random.PRNGKey(9))
    t1params = text1.init(r[3], jnp.zeros((1, 77), jnp.int32))
    t2params = text2.init(r[4], jnp.zeros((1, 77), jnp.int32))
    return StableDiffusionXLBrushNetPipeline(
        vae=(vae, vparams),
        text_encoder=(text1, t1params),
        text_encoder_2=(text2, t2params),
        tokenizer=HashTokenizer(vocab_size=1000),
        tokenizer_2=HashTokenizer(vocab_size=1000),
        unet=(unet, uparams),
        brushnet=(brushnet, bparams),
        depth_conditioning_mode="concat",
    )


def test_sdxl_smoke(pipe):
    rng = np.random.RandomState(0)
    image = rng.rand(H, W, 3).astype(np.float32)
    mask = np.zeros((H, W, 3), np.float32)
    mask[16:48, 16:48] = 1.0
    depth = rng.rand(H, W, 1).astype(np.float32)
    out = pipe("a mirror on the wall", image, mask, depth=depth,
               num_inference_steps=2, guidance_scale=5.0, seed=3)
    assert out.shape == (1, H, W, 3) and out.dtype == np.uint8
    out2 = pipe("a mirror on the wall", image, mask, depth=depth,
                num_inference_steps=2, guidance_scale=5.0, seed=3)
    np.testing.assert_array_equal(out, out2)


def test_encode_prompt_xl_shapes(pipe):
    emb, pooled = pipe.encode_prompt_xl("hello world", do_classifier_free_guidance=True)
    assert emb.shape == (2, 77, 24)     # concat(8, 16)
    assert pooled.shape == (2, 16)


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    image = rng.rand(H, W, 3).astype(np.float32)
    mask = np.zeros((H, W, 3), np.float32)
    mask[16:48, 16:48] = 1.0
    depth = rng.rand(H, W, 1).astype(np.float32)
    return image, mask, depth


@pytest.mark.medium
def test_sdxl_num_images_per_prompt(pipe):
    image, mask, depth = _inputs()
    out = pipe("a mirror", image, mask, depth=depth, num_inference_steps=2,
               guidance_scale=5.0, seed=1, num_images_per_prompt=2)
    assert out.shape == (2, H, W, 3)
    # different noise per image
    assert not np.array_equal(out[0], out[1])


@pytest.mark.medium
def test_sdxl_data_parallel_matches_single_device(pipe):
    """8-way batch-sharded SDXL generation == unsharded generation
    (the parity closing VERDICT item 7: SD-1.5's DP machinery now covers
    SDXL's added text_time conditioning)."""
    from reflecting_reality_tpu.parallel.mesh import make_mesh

    image, mask, depth = _inputs()
    kwargs = dict(depth=depth, num_inference_steps=2, guidance_scale=5.0,
                  seed=2, num_images_per_prompt=8)
    ref = pipe("a mirror", image, mask, **kwargs)
    mesh = make_mesh(8)
    pipe.enable_data_parallel(mesh)
    try:
        dp = pipe("a mirror", image, mask, **kwargs)
    finally:
        pipe.disable_data_parallel()
    assert dp.shape == (8, H, W, 3)
    np.testing.assert_allclose(dp.astype(np.int16), ref.astype(np.int16),
                               atol=1)  # uint8 rounding jitter only


class TestSDXLCachedModes:
    @pytest.mark.medium
    def test_deep_cache_smoke_and_reset(self, pipe):
        image, mask, depth = _inputs()
        kwargs = dict(depth=depth, num_inference_steps=4, guidance_scale=5.0, seed=3)
        ref = pipe("a mirror", image, mask, **kwargs)
        pipe.enable_deep_cache(2)
        try:
            fast = pipe("a mirror", image, mask, **kwargs)
        finally:
            pipe.disable_deep_cache()
        assert fast.shape == ref.shape and np.isfinite(fast).all()
        assert not np.array_equal(fast, ref)  # approximate mode
        again = pipe("a mirror", image, mask, **kwargs)
        np.testing.assert_array_equal(again, ref)  # toggle fully resets

    @pytest.mark.medium
    def test_encoder_reuse_smoke_and_reset(self, pipe):
        image, mask, depth = _inputs()
        kwargs = dict(depth=depth, num_inference_steps=4, guidance_scale=5.0, seed=4)
        ref = pipe("a mirror", image, mask, **kwargs)
        pipe.enable_encoder_reuse(2)
        try:
            fast = pipe("a mirror", image, mask, **kwargs)
        finally:
            pipe.disable_encoder_reuse()
        assert fast.shape == ref.shape and np.isfinite(fast).all()
        assert not np.array_equal(fast, ref)
        again = pipe("a mirror", image, mask, **kwargs)
        np.testing.assert_array_equal(again, ref)

    def test_mutual_exclusion(self, pipe):
        pipe.enable_deep_cache(2)
        try:
            pipe.enable_encoder_reuse(2)
            image, mask, depth = _inputs()
            with pytest.raises(ValueError, match="mutually exclusive"):
                pipe("a mirror", image, mask, depth=depth,
                     num_inference_steps=2, guidance_scale=5.0)
        finally:
            pipe.disable_deep_cache()
            pipe.disable_encoder_reuse()


@pytest.mark.medium
def test_sdxl_int8_close_to_exact(pipe):
    """enable_int8 (base-class W8A8 serving mode) covers SDXL: the sampler
    jit traces under the interceptor, outputs stay deterministic and close
    to the exact path.  Fresh pipe: quantization is one-way per instance."""
    image, mask, depth = _inputs()
    kwargs = dict(depth=depth, num_inference_steps=2, guidance_scale=5.0, seed=5)
    exact = pipe("a mirror", image, mask, **kwargs)

    qpipe = _build_pipe()
    qpipe.enable_int8(select=lambda k: hasattr(k, "ndim") and k.ndim in (2, 4))
    q1 = qpipe("a mirror", image, mask, **kwargs)
    q2 = qpipe("a mirror", image, mask, **kwargs)
    np.testing.assert_array_equal(q1, q2)
    assert q1.shape == exact.shape and q1.dtype == np.uint8
    mad = np.abs(q1.astype(int) - exact.astype(int)).mean()
    assert mad < 16.0, mad
