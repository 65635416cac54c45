"""DeepCache tests: reusing the SAME step's deep trunk through the shallow
path must reproduce the full output exactly (the shallow blocks recompute
identically); across steps it is an approximation the pipeline exposes as
enable_deep_cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_models import TINY_UNET, make_brushnet, make_unet


class TestUNetDeepCache:
    @pytest.mark.medium
    def test_same_step_exactness(self):
        unet, params = make_unet()
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
        t = jnp.array([10, 500])
        ehs = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 16))
        out_full, deep = unet.apply(params, x, t, ehs, return_deep=True)
        out_shallow, deep2 = unet.apply(params, x, t, ehs, cached_deep=deep)
        np.testing.assert_allclose(np.asarray(out_shallow), np.asarray(out_full),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(deep2), np.asarray(deep))

    @pytest.mark.medium
    def test_same_step_exactness_with_injection(self):
        unet, uparams = make_unet()
        bn, bparams = make_brushnet()
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
        t = jnp.array([10, 500])
        ehs = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 16))
        cond = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 5))
        down, mid, up = bn.apply(bparams, x, t, ehs, cond)
        # non-zero residuals so the injection path is exercised
        down = [d + 0.01 for d in down]
        up = [u + 0.01 for u in up]
        mid = mid + 0.01
        kw = dict(down_block_add_samples=down, mid_block_add_sample=mid,
                  up_block_add_samples=up)
        out_full, deep = unet.apply(uparams, x, t, ehs, return_deep=True, **kw)
        out_shallow, _ = unet.apply(uparams, x, t, ehs, cached_deep=deep, **kw)
        np.testing.assert_allclose(np.asarray(out_shallow), np.asarray(out_full),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.medium
    def test_stale_deep_differs(self):
        unet, params = make_unet()
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
        t = jnp.array([10, 500])
        ehs = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 16))
        _, deep = unet.apply(params, x, t, ehs, return_deep=True)
        out_new = unet.apply(params, x * 1.5, t, ehs)
        out_stale, _ = unet.apply(params, x * 1.5, t, ehs, cached_deep=deep)
        assert float(jnp.abs(out_new - out_stale).max()) > 1e-4


class TestPipelineDeepCache:
    @pytest.mark.medium
    def test_pipeline_smoke(self):
        from tests.test_pipeline import H, W, _inputs, pipe as pipe_fixture  # noqa: F401
        # rebuild a tiny pipeline inline (fixture is module-scoped elsewhere)
        import tests.test_pipeline as tp

        pipe = tp.pipe.__wrapped__()
        image, mask, depth = tp._inputs()
        kwargs = dict(prompt="m", image=image, mask=mask, depth=depth,
                      num_inference_steps=4, guidance_scale=7.5, seed=0)
        ref = pipe(**kwargs)
        pipe.enable_deep_cache(interval=2)
        fast = pipe(**kwargs)
        assert fast.shape == ref.shape
        assert np.isfinite(fast).all()
        # approximation: different from exact but correlated
        assert not np.array_equal(fast, ref)
        pipe.disable_deep_cache()
        again = pipe(**kwargs)
        np.testing.assert_array_equal(again, ref)


class TestEncoderReuse:
    """Faster Diffusion (arXiv 2312.09608) encoder reuse: same-step reuse of
    the encoder cache must be exact; the pipeline mode is an approximation."""

    @pytest.mark.medium
    def test_same_step_exactness_with_injection(self):
        from tests.test_models import make_brushnet, make_unet

        unet, uparams = make_unet()
        bn, bparams = make_brushnet()
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
        t = jnp.array([10, 500])
        ehs = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 16))
        cond = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 5))
        down, mid, up = bn.apply(bparams, x, t, ehs, cond)
        down = [d + 0.01 for d in down]
        up = [u + 0.01 for u in up]
        mid = mid + 0.01
        out_full, enc = unet.apply(
            uparams, x, t, ehs, down_block_add_samples=down,
            mid_block_add_sample=mid, up_block_add_samples=up,
            return_encoder=True,
        )
        out_reuse, enc2 = unet.apply(
            uparams, x, t, ehs, mid_block_add_sample=mid,
            up_block_add_samples=up, cached_encoder=enc, return_encoder=True,
        )
        np.testing.assert_allclose(np.asarray(out_reuse), np.asarray(out_full),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(enc),
                        jax.tree_util.tree_leaves(enc2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_stale_encoder_differs(self):
        from tests.test_models import make_unet

        unet, params = make_unet()
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
        t = jnp.array([10, 500])
        ehs = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 16))
        _, enc = unet.apply(params, x, t, ehs, return_encoder=True)
        out_new = unet.apply(params, x * 1.5, t, ehs)
        out_stale, _ = unet.apply(params, x * 1.5, t, ehs, cached_encoder=enc,
                                  return_encoder=True)
        assert float(jnp.abs(out_new - out_stale).max()) > 1e-4

    @pytest.mark.medium
    def test_pipeline_smoke(self):
        import tests.test_pipeline as tp

        pipe = tp.pipe.__wrapped__()
        image, mask, depth = tp._inputs()
        kwargs = dict(prompt="m", image=image, mask=mask, depth=depth,
                      num_inference_steps=4, guidance_scale=7.5, seed=0)
        ref = pipe(**kwargs)
        pipe.enable_encoder_reuse(interval=2)
        fast = pipe(**kwargs)
        assert fast.shape == ref.shape
        assert np.isfinite(fast).all()
        assert not np.array_equal(fast, ref)
        pipe.disable_encoder_reuse()
        again = pipe(**kwargs)
        np.testing.assert_array_equal(again, ref)


def _tiny_pipe_and_inputs():
    import tests.test_pipeline as tp

    pipe = tp.pipe.__wrapped__()
    image, mask, depth = tp._inputs()
    inputs = dict(prompt="m", image=image, mask=mask, depth=depth,
                  num_inference_steps=4, guidance_scale=7.5, seed=0)
    return pipe, inputs


class TestCachedModesPerStepDispatch:
    """Cached modes work under dispatch='per_step': segments are
    interval-aligned so the full/cached pattern unrolls statically (no
    lax.cond — the cond variant materialized the residual cache as branch
    outputs each step and was measurably slower).  The unrolled program
    fuses differently from the scan's cond body, so parity is to uint8
    rounding (+-1 level), same tolerance as the data-parallel tests; the
    same-chunk determinism is exact."""

    @pytest.mark.medium
    def test_deep_cache_per_step_matches_scan(self):
        pipe, inputs = _tiny_pipe_and_inputs()
        pipe.enable_deep_cache(2)
        try:
            a = pipe(dispatch="scan", **inputs)
            b = pipe(dispatch="per_step", per_step_chunk=3, **inputs)
            c = pipe(dispatch="per_step", per_step_chunk=1, **inputs)
            b2 = pipe(dispatch="per_step", per_step_chunk=3, **inputs)
        finally:
            pipe.disable_deep_cache()
        np.testing.assert_allclose(b.astype(np.int16), a.astype(np.int16), atol=1)
        np.testing.assert_allclose(c.astype(np.int16), a.astype(np.int16), atol=1)
        np.testing.assert_array_equal(b, b2)  # deterministic

    @pytest.mark.medium
    def test_encoder_reuse_per_step_matches_scan(self):
        pipe, inputs = _tiny_pipe_and_inputs()
        pipe.enable_encoder_reuse(2)
        try:
            a = pipe(dispatch="scan", **inputs)
            b = pipe(dispatch="per_step", per_step_chunk=2, **inputs)
        finally:
            pipe.disable_encoder_reuse()
        np.testing.assert_allclose(b.astype(np.int16), a.astype(np.int16), atol=1)
