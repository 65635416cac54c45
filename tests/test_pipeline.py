"""Pipeline smoke tests at tiny config (pattern: reference
tests/pipelines/test_pipelines_common.py:549 PipelineTesterMixin — tiny
components, 2-step runs at 64x64, CFG on/off, output-type equivalence)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflecting_reality_tpu.data.tokenizer import HashTokenizer
from reflecting_reality_tpu.models.brushnet import BrushNetModel
from reflecting_reality_tpu.models.clip_text import CLIPTextModel
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL
from reflecting_reality_tpu.pipelines.brushnet_pipeline import StableDiffusionBrushNetPipeline

H = W = 64  # pixel size; latents 8x8


@pytest.fixture(scope="module")
def pipe():
    cfg = dict(
        block_out_channels=(8, 16, 16, 16),
        attention_head_dim=2,
        cross_attention_dim=32,
        norm_num_groups=4,
        layers_per_block=2,
    )
    unet = UNet2DConditionModel(sample_size=8, **cfg)
    brushnet = BrushNetModel(conditioning_channels=6, **cfg)  # 4+1 mask +1 depth
    vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), norm_num_groups=4)
    text = CLIPTextModel(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
    )
    rngs = jax.random.split(jax.random.PRNGKey(0), 4)
    sample = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([1])
    ehs = jnp.zeros((1, 77, 32))
    uparams = unet.init(rngs[0], sample, t, ehs)
    bparams = brushnet.init(rngs[1], sample, t, ehs, jnp.zeros((1, 8, 8, 6)))
    vparams = vae.init(rngs[2], jnp.zeros((1, H, W, 3)), jax.random.PRNGKey(9))
    tparams = text.init(rngs[3], jnp.zeros((1, 77), jnp.int32))
    return StableDiffusionBrushNetPipeline(
        vae=(vae, vparams),
        text_encoder=(text, tparams),
        tokenizer=HashTokenizer(vocab_size=1000),
        unet=(unet, uparams),
        brushnet=(brushnet, bparams),
        depth_conditioning_mode="concat",
    )


def _inputs():
    rng = np.random.RandomState(0)
    image = rng.rand(H, W, 3).astype(np.float32)
    mask = np.zeros((H, W, 3), np.float32)
    mask[16:48, 16:48] = 1.0  # white = mirror region
    depth = rng.rand(H, W, 1).astype(np.float32)
    return image, mask, depth


class TestPipeline:
    def test_unipc_smoke_and_determinism(self, pipe):
        image, mask, depth = _inputs()
        kwargs = dict(
            prompt="a photo of a mirror", image=image, mask=mask, depth=depth,
            num_inference_steps=2, guidance_scale=7.5, seed=42, scheduler="unipc",
        )
        out1 = pipe(**kwargs)
        out2 = pipe(**kwargs)
        assert out1.shape == (1, H, W, 3)
        assert out1.dtype == np.uint8
        np.testing.assert_array_equal(out1, out2)

    @pytest.mark.medium
    def test_ddim_and_no_cfg(self, pipe):
        image, mask, depth = _inputs()
        out = pipe(
            prompt="mirror", image=image, mask=mask, depth=depth,
            num_inference_steps=2, guidance_scale=1.0, seed=0, scheduler="ddim",
        )
        assert out.shape == (1, H, W, 3)

    def test_seeds_differ(self, pipe):
        image, mask, depth = _inputs()
        a = pipe(prompt="m", image=image, mask=mask, depth=depth,
                 num_inference_steps=2, seed=0)
        b = pipe(prompt="m", image=image, mask=mask, depth=depth,
                 num_inference_steps=2, seed=1)
        assert np.abs(a.astype(int) - b.astype(int)).max() > 0

    def test_latent_output_and_pil(self, pipe):
        image, mask, depth = _inputs()
        lat = pipe(prompt="m", image=image, mask=mask, depth=depth,
                   num_inference_steps=2, seed=0, output_type="latent")
        assert lat.shape == (1, H, W, 3)  # decoded image pre-postprocess
        pil = pipe(prompt="m", image=image, mask=mask, depth=depth,
                   num_inference_steps=2, seed=0, output_type="pil")
        assert len(pil) == 1 and pil[0].size == (W, H)

    def test_device_output_matches_blocking(self, pipe):
        """output_type='device' returns un-fetched uint8 whose fetched
        postprocess is byte-identical to the blocking 'np' path (the CLI's
        overlapped drive loop relies on this)."""
        image, mask, depth = _inputs()
        blocking = pipe(prompt="m", image=image, mask=mask, depth=depth,
                        num_inference_steps=2, seed=0, output_type="np")
        dev = pipe(prompt="m", image=image, mask=mask, depth=depth,
                   num_inference_steps=2, seed=0, output_type="device")
        fetched = pipe.image_processor.postprocess(
            np.asarray(dev), output_type="np"
        )
        assert fetched.dtype == blocking.dtype
        np.testing.assert_array_equal(fetched, blocking)

    def test_control_guidance_window(self, pipe):
        image, mask, depth = _inputs()
        out = pipe(prompt="m", image=image, mask=mask, depth=depth,
                   num_inference_steps=4, seed=0,
                   control_guidance_start=0.25, control_guidance_end=0.75)
        assert out.shape == (1, H, W, 3)


@pytest.fixture(scope="module")
def ip_pipe():
    """Tiny ip_adapter-mode pipeline: unet with ip_num_tokens=4 decoupled
    cross-attention + NormalProjModel (reference wiring
    train_brushnet_mirror.py:74-88,1085-1123)."""
    from reflecting_reality_tpu.models.ip_adapter import (
        NORMALS_EMBED_DIM, NormalProjModel,
    )

    cfg = dict(
        block_out_channels=(8, 16, 16, 16),
        attention_head_dim=2,
        cross_attention_dim=32,
        norm_num_groups=4,
        layers_per_block=2,
    )
    unet = UNet2DConditionModel(sample_size=8, ip_num_tokens=4, ip_scale=1.0, **cfg)
    brushnet = BrushNetModel(conditioning_channels=6, **cfg)
    vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), norm_num_groups=4)
    text = CLIPTextModel(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
    )
    rngs = jax.random.split(jax.random.PRNGKey(0), 5)
    sample = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([1])
    ehs_ip = jnp.zeros((1, 78, 32))  # 77 text + 1 normal token
    uparams = unet.init(rngs[0], sample, t, ehs_ip)
    bparams = brushnet.init(rngs[1], sample, t, jnp.zeros((1, 77, 32)),
                            jnp.zeros((1, 8, 8, 6)))
    vparams = vae.init(rngs[2], jnp.zeros((1, H, W, 3)), jax.random.PRNGKey(9))
    tparams = text.init(rngs[3], jnp.zeros((1, 77), jnp.int32))
    proj = NormalProjModel(cross_attention_dim=32)
    pparams = proj.init(rngs[4], jnp.zeros((1, 1, NORMALS_EMBED_DIM)))
    return StableDiffusionBrushNetPipeline(
        vae=(vae, vparams),
        text_encoder=(text, tparams),
        tokenizer=HashTokenizer(vocab_size=1000),
        unet=(unet, uparams),
        brushnet=(brushnet, bparams),
        depth_conditioning_mode="concat",
        normals_conditioning_mode="ip_adapter",
        normal_proj=(proj, pparams),
    )


class TestIPAdapterPipeline:
    @pytest.mark.medium
    def test_end_to_end_and_determinism(self, ip_pipe):
        image, mask, depth = _inputs()
        normal = np.asarray([[0.0, 0.0, 1.0]], np.float32)  # (1, 3)
        kwargs = dict(
            prompt="a mirror", image=image, mask=mask, depth=depth,
            normals=normal, num_inference_steps=2, guidance_scale=7.5, seed=3,
        )
        out1 = ip_pipe(**kwargs)
        out2 = ip_pipe(**kwargs)
        assert out1.shape == (1, H, W, 3)
        np.testing.assert_array_equal(out1, out2)

    def test_normal_token_changes_output(self, ip_pipe):
        """The projected normal must flow through to_k_ip/to_v_ip into the
        result: two different mirror normals -> different images."""
        image, mask, depth = _inputs()
        a = ip_pipe(prompt="m", image=image, mask=mask, depth=depth,
                    normals=np.asarray([[0.0, 0.0, 1.0]], np.float32),
                    num_inference_steps=2, seed=0)
        b = ip_pipe(prompt="m", image=image, mask=mask, depth=depth,
                    normals=np.asarray([[1.0, 0.0, 0.0]], np.float32),
                    num_inference_steps=2, seed=0)
        assert np.abs(a.astype(int) - b.astype(int)).max() > 0

    def test_requires_normals(self, ip_pipe):
        image, mask, depth = _inputs()
        with pytest.raises(ValueError, match="mean\n?.*mirror normal|ip_adapter"):
            ip_pipe(prompt="m", image=image, mask=mask, depth=depth,
                    num_inference_steps=2, seed=0)

    def test_requires_normal_proj(self):
        with pytest.raises(ValueError):
            StableDiffusionBrushNetPipeline(
                vae=(None, None), text_encoder=(None, None), tokenizer=None,
                unet=(None, None), brushnet=(None, None),
                normals_conditioning_mode="ip_adapter",
            )


class TestPerStepDispatch:
    """dispatch='per_step' (small jitted step + jitted decode, for high-res
    configs whose 50-step scan would compile for tens of minutes) must match
    the scan path."""

    @pytest.mark.parametrize("scheduler", ["unipc", "ddim"])
    @pytest.mark.medium
    def test_matches_scan(self, pipe, scheduler):
        image, mask, depth = _inputs()
        kwargs = dict(
            prompt="a mirror", image=image, mask=mask, depth=depth,
            num_inference_steps=3, guidance_scale=7.5, seed=11,
            scheduler=scheduler,
        )
        a = pipe(dispatch="scan", **kwargs)
        b = pipe(dispatch="per_step", **kwargs)
        np.testing.assert_allclose(
            a.astype(np.float32), b.astype(np.float32), atol=1.0
        )  # uint8: allow 1 quantization step of fp reassociation noise

    @pytest.mark.medium
    def test_guess_mode_per_step_matches_scan(self, pipe):
        image, mask, depth = _inputs()
        kwargs = dict(prompt="m", image=image, mask=mask, depth=depth,
                      num_inference_steps=2, guidance_scale=7.5, seed=0,
                      guess_mode=True)
        a = pipe(dispatch="scan", **kwargs)
        b = pipe(dispatch="per_step", **kwargs)
        assert a.shape == (1, H, W, 3)
        np.testing.assert_allclose(
            a.astype(np.float32), b.astype(np.float32), atol=1.0
        )


@pytest.mark.medium
def test_non_square_resolution(pipe):
    """Non-square sizes (576x512-style aspect) must flow through preprocess,
    conditioning assembly, the scan, and decode with consistent latents."""
    rng = np.random.RandomState(3)
    image = rng.rand(96, 64, 3).astype(np.float32)
    mask = np.zeros((96, 64, 3), np.float32)
    mask[20:60, 16:48] = 1.0
    depth = rng.rand(96, 64, 1).astype(np.float32)
    out = pipe(prompt="m", image=image, mask=mask, depth=depth,
               height=96, width=64, num_inference_steps=2, seed=0)
    assert out.shape == (1, 96, 64, 3)
    assert np.isfinite(out.astype(np.float32)).all()


@pytest.mark.medium
def test_multi_prompt_batch(pipe):
    """A list of prompts batches through CFG layout [uncond..., cond...]."""
    image, mask, depth = _inputs()
    out = pipe(prompt=["a mirror", "another mirror"], image=image, mask=mask,
               depth=depth, num_inference_steps=2, guidance_scale=7.5, seed=0)
    assert out.shape == (2, H, W, 3)
    # the two prompts must produce different images
    assert np.abs(out[0].astype(int) - out[1].astype(int)).max() > 0


@pytest.mark.medium
def test_cast_params_close_to_fp32():
    """cast_params (half-precision weights, the reference torch_dtype policy)
    must stay close to the fp32-weight output and leave the VAE untouched."""
    import jax.numpy as jnp
    import tests.test_pipeline as tp

    p = tp.pipe.__wrapped__()  # fresh instance; don't mutate the fixture
    image, mask, depth = _inputs()
    kwargs = dict(prompt="m", image=image, mask=mask, depth=depth,
                  num_inference_steps=2, guidance_scale=7.5, seed=0)
    ref = p(**kwargs)
    p.cast_params(jnp.bfloat16)
    leaf = jax.tree_util.tree_leaves(p.unet_params)[0]
    assert leaf.dtype == jnp.bfloat16
    vleaf = jax.tree_util.tree_leaves(p.vae_params)[0]
    assert vleaf.dtype == jnp.float32  # VAE stays fp32 by default
    out = p(**kwargs)
    assert out.shape == ref.shape
    # bf16 weights: small drift, same image up to a few uint8 steps
    assert np.abs(out.astype(np.float32) - ref.astype(np.float32)).mean() < 8.0


def test_guess_mode_smoke(pipe):
    """guess_mode: brushnet on the cond half only, uncond half zero-padded
    (reference pipeline_brushnet.py:1260-1295)."""
    image, mask, depth = _inputs()
    out = pipe(prompt="m", image=image, mask=mask, depth=depth,
               num_inference_steps=2, guidance_scale=7.5, seed=0,
               guess_mode=True)
    assert out.shape == (1, H, W, 3)
    assert np.isfinite(out.astype(np.float32)).all()


class TestDataParallelGeneration:
    @pytest.mark.medium
    def test_dp_matches_single_device(self, pipe):
        """Batch-sharded generation over the 8-device mesh must reproduce the
        unsharded output (same seeds, same program up to layout)."""
        from reflecting_reality_tpu.parallel.mesh import make_mesh

        image, mask, depth = _inputs()
        kwargs = dict(
            prompt="a photo of a mirror", image=image, mask=mask, depth=depth,
            num_inference_steps=2, guidance_scale=7.5, seed=42,
            num_images_per_prompt=8,
        )
        ref = pipe(**kwargs)
        mesh = make_mesh(8)
        pipe.enable_data_parallel(mesh)
        try:
            got = pipe(**kwargs)
        finally:
            pipe.disable_data_parallel()
        assert got.shape == ref.shape == (8, H, W, 3)
        # uint8 outputs; allow a 1-step rounding wobble from layout-dependent
        # fp reassociation, but require virtually everything identical
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 0.01, (
            diff.max(), (diff > 0).mean())

    def test_dp_rejects_indivisible_batch(self, pipe):
        from reflecting_reality_tpu.parallel.mesh import make_mesh

        image, mask, depth = _inputs()
        pipe.enable_data_parallel(make_mesh(8))
        try:
            with pytest.raises(ValueError, match="divisible"):
                pipe(prompt="m", image=image, mask=mask, depth=depth,
                     num_inference_steps=2, seed=0, num_images_per_prompt=3)
        finally:
            pipe.disable_data_parallel()


class TestConditioningModes:
    """The depth/normals conditioning-mode matrix beyond the golden-pinned
    depth-concat path (reference pipeline_brushnet.py:1188-1215: depth
    'concat' 1ch | 'latents' 4ch VAE-encoded; normals 'concat' 3ch |
    'latents' 4ch).  All run through the single packed host->device
    conditioning upload."""

    def _pipe(self, depth_mode, normals_mode, cond_channels):
        cfg = dict(
            block_out_channels=(8, 16, 16, 16),
            attention_head_dim=2,
            cross_attention_dim=32,
            norm_num_groups=4,
            layers_per_block=2,
        )
        unet = UNet2DConditionModel(sample_size=8, **cfg)
        brushnet = BrushNetModel(conditioning_channels=cond_channels, **cfg)
        vae = AutoencoderKL(block_out_channels=(8, 8, 8, 8), norm_num_groups=4)
        text = CLIPTextModel(
            vocab_size=1000, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
        )
        rngs = jax.random.split(jax.random.PRNGKey(0), 4)
        sample = jnp.zeros((1, 8, 8, 4))
        t = jnp.array([1])
        ehs = jnp.zeros((1, 77, 32))
        bparams = brushnet.init(
            rngs[1], sample, t, ehs, jnp.zeros((1, 8, 8, cond_channels)))
        # a fresh BrushNet's 28 zero-convs make it an identity w.r.t. the
        # base UNet (conditioning cannot reach the output); perturb the
        # params so the sensitivity assertions below are meaningful
        leaves = jax.tree_util.tree_leaves_with_path(bparams)
        bparams = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(bparams),
            [v + 0.05 * jax.random.normal(jax.random.PRNGKey(hash(str(p)) % (2**31)),
                                          v.shape, v.dtype)
             for p, v in leaves],
        )
        return StableDiffusionBrushNetPipeline(
            vae=(vae, vae.init(rngs[2], jnp.zeros((1, H, W, 3)),
                               jax.random.PRNGKey(9))),
            text_encoder=(text, text.init(rngs[3], jnp.zeros((1, 77), jnp.int32))),
            tokenizer=HashTokenizer(vocab_size=1000),
            unet=(unet, unet.init(rngs[0], sample, t, ehs)),
            brushnet=(brushnet, bparams),
            depth_conditioning_mode=depth_mode,
            normals_conditioning_mode=normals_mode,
        )

    @pytest.mark.medium
    def test_depth_latents_mode(self):
        """depth 'latents': 3ch-repeat -> VAE encode -> 4 extra cond
        channels (4 img + 1 mask + 4 depth = 9)."""
        pipe = self._pipe("latents", None, 9)
        image, mask, depth = _inputs()
        kwargs = dict(prompt="m", image=image, mask=mask, depth=depth,
                      num_inference_steps=2, seed=0,
                      deterministic_vae_encode=True)
        out1 = pipe(**kwargs)
        out2 = pipe(**kwargs)
        assert out1.shape == (1, H, W, 3) and out1.dtype == np.uint8
        np.testing.assert_array_equal(out1, out2)
        # the encoded depth plane must influence the result
        other = pipe(**dict(kwargs, depth=1.0 - depth))
        assert np.abs(out1.astype(int) - other.astype(int)).max() > 0

    def test_normals_concat_mode(self):
        """normals 'concat': latent-res normals join the cond stack
        (4 + 1 + 1 depth + 3 normals = 9)."""
        pipe = self._pipe("concat", "concat", 9)
        image, mask, depth = _inputs()
        normals = np.random.RandomState(3).rand(H, W, 3).astype(np.float32)
        kwargs = dict(prompt="m", image=image, mask=mask, depth=depth,
                      normals=normals, num_inference_steps=2, seed=0,
                      deterministic_vae_encode=True)
        out1 = pipe(**kwargs)
        assert out1.shape == (1, H, W, 3)
        other = pipe(**dict(kwargs, normals=1.0 - normals))
        assert np.abs(out1.astype(int) - other.astype(int)).max() > 0
        with pytest.raises(ValueError, match="normals"):
            pipe(prompt="m", image=image, mask=mask, depth=depth,
                 num_inference_steps=2, seed=0)

    @pytest.mark.medium
    def test_normals_latents_mode(self):
        """normals 'latents': VAE-encoded normals, the reference's
        conditioning_channels=13 configuration (4 + 1 + 4 + 4)."""
        pipe = self._pipe("latents", "latents", 13)
        image, mask, depth = _inputs()
        normals = np.random.RandomState(3).rand(H, W, 3).astype(np.float32)
        out = pipe(prompt="m", image=image, mask=mask, depth=depth,
                   normals=normals, num_inference_steps=2, seed=0,
                   deterministic_vae_encode=True)
        assert out.shape == (1, H, W, 3)


def test_prompt_embed_cache(pipe):
    """encode_prompt memoizes per texts-tuple (the CFG uncond batch hits
    every call); cached and fresh embeds are identical and distinct prompts
    don't collide."""
    pipe._prompt_cache.clear()
    e1 = pipe.encode_prompt("a mirror", None, 1, True)
    assert len(pipe._prompt_cache) == 2  # ("a mirror",) and ("",)
    e2 = pipe.encode_prompt("a mirror", None, 1, True)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    e3 = pipe.encode_prompt("another prompt", None, 1, True)
    assert np.abs(np.asarray(e1) - np.asarray(e3)).max() > 0
