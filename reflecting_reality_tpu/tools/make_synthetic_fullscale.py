"""Synthetic full-scale run fixture: SD-1.5-shaped checkpoint + SynMirror shard.

The reference's primary artifact is a real 20K-step training job on SynMirror
(train_brushnet_mirror.py:1346-1523, recipe MirrorFusion/README.md).  This
environment has neither the dataset nor the trained weights (no network), so
the honest maximal proxy is: random-init weights at the EXACT SD-1.5 shapes
written in the reference checkpoint layout, plus a synthetic SynMirror HDF5
shard at full 512x512 resolution — then drive `cli/train.py` against them on
the real chip (loss must decrease, throughput must match the step benchmark),
resume from the produced checkpoint, and generate through `cli/test.py`.

Images are LOW-FREQUENCY random fields (16x16 bilinear-upsampled), not white
noise: their VAE latents carry structure the brushnet can actually learn to
exploit, and PSNR against them is meaningful for the eval protocol.

Usage:
  python -m reflecting_reality_tpu.tools.make_synthetic_fullscale \
      --out /tmp/rr_e2e [--n 64] [--size 512] [--tiny]
Writes:
  <out>/sd15/{unet,vae,text_encoder,tokenizer}/   reference-layout checkpoint
  <out>/data/obj/*.hdf5 + train.csv + test.csv    SynMirror-layout shard
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def write_byte_tokenizer(tok_dir: str) -> None:
    """A valid byte-level CLIP vocab with no merges (every word splits into
    byte tokens + '</w>' variants); ids stay < 49408 so the full-size text
    encoder's embedding table covers them."""
    from reflecting_reality_tpu.data.tokenizer import _bytes_to_unicode

    os.makedirs(tok_dir, exist_ok=True)
    chars = list(_bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")


def make_checkpoint(base_dir: str, seed: int = 0, tiny: bool = False) -> str:
    """Random-init SD-1.5-shaped components in the reference folder layout
    (what from_pretrained reads back: unet/ vae/ text_encoder/ tokenizer/)."""
    import jax
    import jax.numpy as jnp

    from reflecting_reality_tpu.core.io import (
        flax_to_torch_state, save_pretrained, save_safetensors,
    )
    from reflecting_reality_tpu.models.clip_text import CLIPTextModel
    from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
    from reflecting_reality_tpu.models.vae import AutoencoderKL

    rngs = jax.random.split(jax.random.PRNGKey(seed), 3)
    if tiny:
        unet_cfg = dict(sample_size=8, block_out_channels=(8, 16, 16, 16),
                        attention_head_dim=2, cross_attention_dim=32,
                        norm_num_groups=4, layers_per_block=2)
        vae_cfg = dict(block_out_channels=(4, 4, 4, 4), norm_num_groups=2)
        text_cfg = dict(vocab_size=49408, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=77)
    else:
        unet_cfg, vae_cfg = {}, {}          # SD-1.5 defaults
        text_cfg = {}                        # CLIP ViT-L/14 text defaults

    unet = UNet2DConditionModel(**unet_cfg)
    ca = unet.cross_attention_dim
    uparams = jax.jit(unet.init)(
        rngs[0], jnp.zeros((1, 8, 8, 4)), jnp.array([1]), jnp.zeros((1, 77, ca)))
    save_pretrained(unet, jax.device_get(uparams)["params"],
                    os.path.join(base_dir, "unet"))
    del uparams

    vae = AutoencoderKL(**vae_cfg)
    vparams = jax.jit(vae.init)(rngs[1], jnp.zeros((1, 64, 64, 3)),
                                jax.random.PRNGKey(9))
    save_pretrained(vae, jax.device_get(vparams)["params"],
                    os.path.join(base_dir, "vae"))
    del vparams

    text = CLIPTextModel(**text_cfg)
    tparams = jax.jit(text.init)(rngs[2], jnp.zeros((1, 77), jnp.int32))
    tdir = os.path.join(base_dir, "text_encoder")
    os.makedirs(tdir, exist_ok=True)
    save_safetensors(flax_to_torch_state(jax.device_get(tparams)["params"]),
                     os.path.join(tdir, "model.safetensors"))
    with open(os.path.join(tdir, "config.json"), "w") as f:
        json.dump(dict(vocab_size=text.vocab_size, hidden_size=text.hidden_size,
                       num_hidden_layers=text.num_hidden_layers,
                       num_attention_heads=text.num_attention_heads,
                       intermediate_size=text.intermediate_size,
                       max_position_embeddings=text.max_position_embeddings), f)
    del tparams

    write_byte_tokenizer(os.path.join(base_dir, "tokenizer"))
    return base_dir


def _lowfreq(rng: np.random.RandomState, size: int, ch: int) -> np.ndarray:
    """(size, size, ch) in [0, 1): 16x16 random field, bilinear-upsampled —
    structured enough for VAE latents to be learnable."""
    from PIL import Image

    coarse = rng.rand(16, 16, ch).astype(np.float32)
    planes = [np.asarray(Image.fromarray(
        (coarse[..., c] * 255).astype(np.uint8)).resize((size, size),
                                                        Image.BILINEAR))
              for c in range(ch)]
    return np.stack(planes, axis=-1).astype(np.float32) / 255.0


def make_data(data_dir: str, n: int = 64, size: int = 512) -> None:
    """SynMirror-layout shard: obj/*.hdf5 (colors, category_id_segmaps with
    1=mirror 2=object, depth, normals, cam_states) + train.csv/test.csv —
    the exact keys extract_data_from_hdf5 reads (reference
    data_utils.get_hdf5_data)."""
    import h5py
    import pandas as pd

    rows = []
    os.makedirs(os.path.join(data_dir, "obj"), exist_ok=True)
    q = size // 4
    for i in range(n):
        rng = np.random.RandomState(1000 + i)
        seg = np.zeros((size, size), np.uint8)
        seg[q: 3 * q, q: 3 * q] = 1                        # mirror plane
        oy, ox = rng.randint(q + 8, 2 * q, 2)
        seg[oy: oy + q // 2, ox: ox + q // 2] = 2          # object in mirror
        colors = (_lowfreq(rng, size, 3) * 255).astype(np.uint8)
        depth = (2.0 + 3.0 * _lowfreq(rng, size, 1)[..., 0]).astype(np.float32)
        nrm = _lowfreq(rng, size, 3) - 0.5
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-6
        cam = json.dumps({"cam2world": np.eye(4).tolist(),
                          "cam_K": np.eye(3).tolist()}).encode()
        with h5py.File(os.path.join(data_dir, f"obj/{i}.hdf5"), "w") as f:
            f["colors"] = colors
            f["category_id_segmaps"] = seg
            f["depth"] = depth
            f["normals"] = nrm.astype(np.float32)
            f["cam_states"] = np.frombuffer(cam, dtype=np.uint8)
        rows.append({"uid": f"uid{i:03d}", "path": f"obj/{i}.hdf5",
                     "auto_caption": f"a low frequency scene number {i}"})
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(data_dir, "train.csv"), index=False)
    df.iloc[: max(4, n // 8)].to_csv(os.path.join(data_dir, "test.csv"),
                                     index=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny-config checkpoint (CI-sized) instead of SD-1.5")
    ap.add_argument("--skip_checkpoint", action="store_true")
    ap.add_argument("--skip_data", action="store_true")
    args = ap.parse_args()

    # weight generation is host-side work; never grab the TPU for it
    import jax

    jax.config.update("jax_platforms", "cpu")

    if not args.skip_checkpoint:
        make_checkpoint(os.path.join(args.out, "sd15"), args.seed, args.tiny)
        print(f"checkpoint: {os.path.join(args.out, 'sd15')}", flush=True)
    if not args.skip_data:
        make_data(os.path.join(args.out, "data"), args.n, args.size)
        print(f"data: {os.path.join(args.out, 'data')} ({args.n} samples)",
              flush=True)


if __name__ == "__main__":
    main()
