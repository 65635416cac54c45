"""Spatially-sharded / tiled VAE decode (BASELINE.md config #5: the 1024²
variant needs it — decoder activations reach 512ch x 1024² ≈ 2 GB/image).

The decoder tail cannot be sharded exactly: every ResnetBlock GroupNorm
normalizes over the FULL spatial extent, so per-tile statistics necessarily
differ (and the mid block's attention is global outright).  This module
implements the standard answer — the same scheme as diffusers'
`enable_vae_tiling` for SDXL-1024 decode: decode overlapping W tiles and
linearly cross-fade them, which is seam-free and visually identical while
bounding per-tile memory.  (An exact alternative — psum-based distributed
GroupNorm with halo-masked statistics threaded through every block — is
noted as future work.)

Split (models.vae.Decoder.head/tail):
    head: post_quant_conv -> conv_in -> mid   (latent res, replicated; the
          global attention lives here and stays exact)
    tail: conv-only up blocks + norm/conv_out (tiled along W with overlap)

`sharded_decode` places each chip's weighted tile on a zero canvas and psums
canvas and weights over the mesh axis — one collective, output replicated.
`tiled_decode` is the sequential single-chip variant with identical math, so
both paths produce the same image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from jax import shard_map


def _tail_apply(vae_module, params, tile):
    return vae_module.apply(params, tile, method=lambda m, x: m.decoder.tail(x))


def _head(vae_module, params, z):
    def f(m, z):
        return m.decoder.head(m.post_quant_conv(z))

    return vae_module.apply(params, z, method=f)


def _tile_weights(idx, num_tiles: int, tile_w: int, overlap: int) -> jnp.ndarray:
    """(tile_w,) cross-fade weights: linear ramps over the overlap at interior
    edges, flat 1 in the core, flat 1 at true image edges."""
    pos = jnp.arange(tile_w, dtype=jnp.float32)
    up = jnp.clip((pos + 1.0) / (overlap + 1.0), 0.0, 1.0)
    down = jnp.clip((tile_w - pos) / (overlap + 1.0), 0.0, 1.0)
    w = jnp.ones((tile_w,), jnp.float32)
    w = jnp.where(idx > 0, jnp.minimum(w, up), w)
    w = jnp.where(idx < num_tiles - 1, jnp.minimum(w, down), w)
    return w


def _decode_and_place(vae_module, params, h, idx, num_tiles: int, overlap: int,
                      scale: int, out_shape):
    """Decode tile `idx` and place (weighted) onto a zero canvas."""
    w_lat = h.shape[2]
    chunk = w_lat // num_tiles
    tile_lat = chunk + 2 * overlap
    start = jnp.clip(idx * chunk - overlap, 0, w_lat - tile_lat)
    tile = jax.lax.dynamic_slice_in_dim(h, start, tile_lat, axis=2)
    out = _tail_apply(vae_module, params, tile)          # (B, H*s, tile_lat*s, C)

    wts = _tile_weights(idx, num_tiles, tile_lat * scale, 2 * overlap * scale)
    canvas = jnp.zeros(out_shape, out.dtype)
    wsum = jnp.zeros(out_shape[:2] + (out_shape[2], 1), jnp.float32)
    canvas = jax.lax.dynamic_update_slice_in_dim(
        canvas, out * wts[None, None, :, None].astype(out.dtype), start * scale, axis=2
    )
    wsum = jax.lax.dynamic_update_slice_in_dim(
        wsum, jnp.broadcast_to(wts[None, None, :, None],
                               out.shape[:2] + (out.shape[2], 1)),
        start * scale, axis=2,
    )
    return canvas, wsum


def _out_shape(vae_module, z, scale):
    b, hl, wl, _ = z.shape
    return (b, hl * scale, wl * scale, vae_module.out_channels)


def tiled_decode(vae_module, params, z, num_tiles: int = 4, overlap: int = 8,
                 scale: int = 8):
    """Single-chip memory-bounded decode: sequential overlapping W tiles."""
    h = _head(vae_module, params, z)
    assert h.shape[2] % num_tiles == 0, (h.shape, num_tiles)
    assert h.shape[2] >= h.shape[2] // num_tiles + 2 * overlap
    out_shape = _out_shape(vae_module, z, scale)

    def body(carry, idx):
        canvas, wsum = carry
        c, w = _decode_and_place(vae_module, params, h, idx, num_tiles,
                                 overlap, scale, out_shape)
        return (canvas + c, wsum + w), None

    init = (jnp.zeros(out_shape, h.dtype),
            jnp.zeros(out_shape[:2] + (out_shape[2], 1), jnp.float32))
    (canvas, wsum), _ = jax.lax.scan(body, init, jnp.arange(num_tiles))
    return canvas / jnp.maximum(wsum, 1e-8).astype(canvas.dtype)


def sharded_decode(vae_module, params, z, mesh, axis_name: str = "data",
                   overlap: int = 8, scale: int = 8):
    """Mesh decode: head replicated, one overlapping W tile per device,
    weighted-canvas psum blend.  Identical math to tiled_decode."""
    n = mesh.shape[axis_name]
    h = _head(vae_module, params, z)
    assert h.shape[2] % n == 0, (h.shape, n)
    assert h.shape[2] >= h.shape[2] // n + 2 * overlap
    out_shape = _out_shape(vae_module, z, scale)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
        check_vma=False,
    )
    def tail(params, h):
        idx = jax.lax.axis_index(axis_name)
        canvas, wsum = _decode_and_place(vae_module, params, h, idx, n,
                                         overlap, scale, out_shape)
        canvas = jax.lax.psum(canvas, axis_name)
        wsum = jax.lax.psum(wsum, axis_name)
        return canvas / jnp.maximum(wsum, 1e-8).astype(canvas.dtype)

    return tail(params, h)
