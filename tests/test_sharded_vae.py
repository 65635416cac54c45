"""Sharded/tiled VAE decode: the two paths must agree with each other, stay
close to the full decode (tile GroupNorm statistics make bit-exactness
impossible by construction — see module docstring), and show no seams."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflecting_reality_tpu.models.vae import AutoencoderKL
from reflecting_reality_tpu.parallel.mesh import make_mesh
from reflecting_reality_tpu.parallel.sharded_vae import (
    sharded_decode,
    sharded_decode_exact,
    tiled_decode,
)


@pytest.fixture(scope="module")
def vae_and_latent():
    vae = AutoencoderKL(block_out_channels=(4, 4, 4, 4), norm_num_groups=2)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                      jax.random.PRNGKey(1))
    z = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 4))
    full = vae.apply(params, z, method=lambda m, x: m.decode(x))
    return vae, params, z, full


@pytest.mark.medium
def test_tiled_close_to_full_and_seamless(vae_and_latent):
    vae, params, z, full = vae_and_latent
    out = tiled_decode(vae, params, z, num_tiles=4, overlap=8)
    assert out.shape == full.shape
    full_np, out_np = np.asarray(full), np.asarray(out)
    scale_ref = np.abs(full_np).mean()
    assert np.abs(out_np - full_np).mean() < 0.25 * scale_ref
    # no seams: horizontal gradient at tile boundaries comparable to elsewhere
    grad = np.abs(np.diff(out_np, axis=2))
    boundary_cols = [128 * i for i in (1, 2, 3)]
    for c in boundary_cols:
        assert grad[:, :, c - 1].mean() < 10 * grad.mean()


@pytest.mark.medium
def test_sharded_matches_tiled(vae_and_latent):
    """Same math on the mesh: sharded == tiled (up to reduction order)."""
    vae, params, z, _ = vae_and_latent
    mesh = make_mesh(8)
    out_s = jax.jit(lambda p, z: sharded_decode(vae, p, z, mesh, overlap=8))(params, z)
    out_t = tiled_decode(vae, params, z, num_tiles=8, overlap=8)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_t),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.medium
def test_exact_sharded_matches_full(vae_and_latent):
    """The psum-GroupNorm + halo-exchange path must reproduce the unsharded
    decode to fp32 reassociation noise (BASELINE config #5 exact variant)."""
    vae, params, z, full = vae_and_latent
    mesh = make_mesh(8)
    out = jax.jit(lambda p, z: sharded_decode_exact(vae, p, z, mesh))(params, z)
    assert out.shape == full.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=1e-4, atol=2e-5)


@pytest.mark.medium
def test_exact_sharded_channel_change_and_batch(vae_and_latent):
    """Exercise conv_shortcut (channel-changing resnets) + batch > 1."""
    vae = AutoencoderKL(block_out_channels=(4, 8, 8, 8), norm_num_groups=2)
    params = vae.init(jax.random.PRNGKey(3), jnp.zeros((2, 64, 64, 3)),
                      jax.random.PRNGKey(4))
    z = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 4))
    full = vae.apply(params, z, method=lambda m, x: m.decode(x))
    mesh = make_mesh(8)
    out = jax.jit(lambda p, z: sharded_decode_exact(vae, p, z, mesh))(params, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=1e-4, atol=2e-5)


def test_tiled_error_bounded_by_exact(vae_and_latent):
    """Pin the tiled path's approximation error as a NUMBER against the exact
    decode (VERDICT round-1 item 8: 'visually identical' must be a bound)."""
    vae, params, z, full = vae_and_latent
    out = tiled_decode(vae, params, z, num_tiles=4, overlap=8)
    err = float(np.abs(np.asarray(out) - np.asarray(full)).max())
    scale_ref = float(np.abs(np.asarray(full)).max())
    # random-init decoder output scale ~0.5; keep an absolute + relative bound
    assert err < 0.15 * scale_ref, (err, scale_ref)


@pytest.mark.medium
def test_more_overlap_is_closer(vae_and_latent):
    vae, params, z, full = vae_and_latent
    err = []
    for overlap in (2, 12):
        out = tiled_decode(vae, params, z, num_tiles=4, overlap=overlap)
        err.append(float(jnp.abs(out - full).mean()))
    assert err[1] < err[0]


@pytest.mark.medium
def test_pipeline_sharded_vae_matches_plain():
    """enable_sharded_vae(exact=True) through the full pipeline must
    reproduce the plain-decode pipeline output (CPU mesh)."""
    import tests.test_pipeline as tp

    pipe = tp.pipe.__wrapped__()
    image, mask, depth = tp._inputs()
    kwargs = dict(prompt="m", image=image, mask=mask, depth=depth,
                  num_inference_steps=2, guidance_scale=7.5, seed=0)
    ref = pipe(**kwargs)
    pipe.enable_sharded_vae(make_mesh(8))
    out = pipe(**kwargs)
    # uint8 quantization: allow 1 step of fp32 reassociation noise
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
    pipe.disable_sharded_vae()
    again = pipe(**kwargs)
    np.testing.assert_array_equal(again, ref)
