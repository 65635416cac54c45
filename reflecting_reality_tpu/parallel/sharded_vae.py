"""Spatially-sharded / tiled VAE decode (BASELINE.md config #5: the 1024²
variant needs it — decoder activations reach 512ch x 1024² ≈ 2 GB/image).

Three decode paths over the same Decoder.head/tail split
(models.vae.Decoder: head = post_quant_conv -> conv_in -> mid, replicated —
the global attention lives there and stays exact; tail = conv-only up blocks
+ norm/conv_out, finite receptive field):

- `tiled_decode` (single chip): overlapping W tiles, linear cross-fade —
  the diffusers enable_vae_tiling scheme.  APPROXIMATE: per-tile GroupNorm
  statistics differ from the global ones; the error is bounded by test
  (tests/test_sharded_vae.py pins tiled-vs-exact max abs diff).
- `sharded_decode` (mesh): one overlapping W tile per device, weighted-canvas
  psum blend.  Identical math to tiled_decode (same approximation).
- `sharded_decode_exact` (mesh): EXACT spatial sharding — every GroupNorm
  computes its statistics with a psum over the mesh axis (two-pass: mean,
  then variance of deviations, both fp32 — same arithmetic as
  ops.norms.group_norm), and every 3x3 conv exchanges one halo column with
  its neighbors via ppermute (zero at true image edges == the conv's zero
  padding).  Nearest-x2 upsampling is alignment-safe under W sharding
  (output columns 2k,2k+1 both come from input column k), so no
  redistribution is needed.  Output matches the unsharded decode to fp32
  reassociation noise.  This is the psum-GroupNorm variant promised by
  BASELINE config #5 / VERDICT round-1 item 8.
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


# --------------------------------------------------------------------- exact

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _halo_exchange(x, axis_name: str, n: int) -> jnp.ndarray:
    """Concat one neighbor column on each side of the local W chunk.
    Devices at the global edges receive zeros — exactly the 3x3 conv's zero
    padding, so VALID-in-W conv over the haloed chunk equals the global
    SAME conv restricted to this shard."""
    to_right = jax.lax.ppermute(
        x[:, :, -1:, :], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    to_left = jax.lax.ppermute(
        x[:, :, :1, :], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([to_right, x, to_left], axis=2)


def _halo_conv3(x, p, axis_name: str, n: int, dtype) -> jnp.ndarray:
    xh = _halo_exchange(x, axis_name, n).astype(dtype)
    out = jax.lax.conv_general_dilated(
        xh, p["kernel"].astype(dtype), (1, 1),
        padding=((1, 1), (0, 0)), dimension_numbers=_DIMNUMS,
    )
    return out + p["bias"].astype(out.dtype)


def _psum_group_norm(x, p, num_groups: int, eps: float, axis_name: str, n: int,
                     apply_silu: bool = True) -> jnp.ndarray:
    """GroupNorm with EXACT global statistics: fp32 two-pass (mean, then
    variance of deviations — same arithmetic as ops.norms.group_norm) with a
    psum over the W shards."""
    b, h, w, c = x.shape
    cg = c // num_groups
    xg = x.reshape(b, h * w, num_groups, cg).astype(jnp.float32)
    count = float(h * w * cg * n)
    mean = jax.lax.psum(jnp.sum(xg, axis=(1, 3)), axis_name) / count      # (B, G)
    dev = xg - mean[:, None, :, None]
    var = jax.lax.psum(jnp.sum(dev * dev, axis=(1, 3)), axis_name) / count
    xg = dev * jax.lax.rsqrt(var[:, None, :, None] + eps)
    out = (
        xg.reshape(b, h, w, c) * p["scale"].astype(jnp.float32)
        + p["bias"].astype(jnp.float32)
    )
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def _sharded_resnet(x, p, num_groups: int, axis_name: str, n: int, dtype):
    """ResnetBlock2D (ops/resnet.py contract, no temb) on a W shard."""
    h = _psum_group_norm(x, p["norm1"], num_groups, 1e-6, axis_name, n)
    h = _halo_conv3(h, p["conv1"], axis_name, n, dtype)
    h = _psum_group_norm(h, p["norm2"], num_groups, 1e-6, axis_name, n)
    h = _halo_conv3(h, p["conv2"], axis_name, n, dtype)
    if "conv_shortcut" in p:
        x = (
            x.astype(dtype) @ p["conv_shortcut"]["kernel"][0, 0].astype(dtype)
            + p["conv_shortcut"]["bias"].astype(dtype)
        )
    return x + h


def sharded_decode_exact(vae_module, params, z, mesh, axis_name: str = "data"):
    """EXACT mesh decode: head replicated, tail W-sharded with psum GroupNorm
    statistics and ppermute halo exchange at every 3x3 conv.  Bitwise-level
    parity with `vae_module.decode` up to fp32 reassociation
    (tests/test_sharded_vae.py pins it to ~1e-5)."""
    n = mesh.shape[axis_name]
    h = _head(vae_module, params, z)
    assert h.shape[2] % n == 0, (h.shape, n)

    dec = params["params"]["decoder"]
    groups = vae_module.norm_num_groups
    dtype = vae_module.dtype
    bocs = list(reversed(vae_module.block_out_channels))
    num_resnets = vae_module.layers_per_block + 1

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, None, axis_name, None)),
        out_specs=P(None, None, axis_name, None),
        check_vma=False,
    )
    def tail(dec_params, x):
        for i in range(len(bocs)):
            bp = dec_params[f"up_blocks_{i}"]
            for j in range(num_resnets):
                x = _sharded_resnet(x, bp[f"resnets_{j}"], groups, axis_name, n, dtype)
            if i < len(bocs) - 1:
                # nearest x2 is alignment-safe under W sharding
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = _halo_conv3(x, bp["upsamplers_0"]["conv"], axis_name, n, dtype)
        x = _psum_group_norm(x, dec_params["conv_norm_out"], groups, 1e-6, axis_name, n)
        return _halo_conv3(x, dec_params["conv_out"], axis_name, n, dtype)

    return tail(dec, h)
