"""Sharded/tiled VAE decode: the two paths must agree with each other, stay
close to the full decode (tile GroupNorm statistics make bit-exactness
impossible by construction — see module docstring), and show no seams."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflecting_reality_tpu.models.vae import AutoencoderKL
from reflecting_reality_tpu.parallel.mesh import make_mesh
from reflecting_reality_tpu.parallel.sharded_vae import sharded_decode, tiled_decode


@pytest.fixture(scope="module")
def vae_and_latent():
    vae = AutoencoderKL(block_out_channels=(4, 4, 4, 4), norm_num_groups=2)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                      jax.random.PRNGKey(1))
    z = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 4))
    full = vae.apply(params, z, method=lambda m, x: m.decode(x))
    return vae, params, z, full


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


def test_sharded_matches_tiled(vae_and_latent):
    """Same math on the mesh: sharded == tiled (up to reduction order)."""
    vae, params, z, _ = vae_and_latent
    mesh = make_mesh(8)
    out_s = jax.jit(lambda p, z: sharded_decode(vae, p, z, mesh, overlap=8))(params, z)
    out_t = tiled_decode(vae, params, z, num_tiles=8, overlap=8)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_t),
                               rtol=1e-4, atol=1e-5)


def test_more_overlap_is_closer(vae_and_latent):
    vae, params, z, full = vae_and_latent
    err = []
    for overlap in (2, 12):
        out = tiled_decode(vae, params, z, num_tiles=4, overlap=overlap)
        err.append(float(jnp.abs(out - full).mean()))
    assert err[1] < err[0]
