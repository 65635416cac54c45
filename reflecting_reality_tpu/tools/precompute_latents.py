"""Precompute VAE encoder moments for SynMirror training (rebuild addition).

The reference (and our default path) runs two full VAE encodes inside every
training step (train_brushnet_mirror.py:1351-1355).  The encoder is frozen,
so its output DISTRIBUTION per sample never changes — only the stochastic
draw does.  This tool encodes the dataset once and stores the
DiagonalGaussian moments (mean ‖ logvar, latent-res ×8ch); training then
samples from the cached moments every step (`latent_moments` batch keys in
training/train_step.assemble_conditioning_latents) — statistically
identical to per-step encoding, with the encoder FLOPs and the full-res
HDF5 image reads paid once per dataset instead of once per step.

Per sample, `<uid>_<cam>.npz` (or row-index keyed) contains:
  latent_moments        (hl, wl, 8) — VAE moments of pixel_values
  cond_latent_moments   (hl, wl, 8) — VAE moments of the masked image
  masks                 (hl, wl, 1) — mirror mask pre-resized to latent res
  depths                (hl, wl, 1) or (res, res, 1) per depth mode
  [depth_latent_moments / normals_latent_moments / normals] per mode

Captions are NOT cached — tokenization (with empty-prompt dropout) stays at
train time, reading the CSV as usual.  random_flip must be off (cache one
deterministic variant); shuffling still happens at the loader level.

Usage:
  python -m reflecting_reality_tpu.tools.precompute_latents \
    --pretrained_model_name_or_path <sd15> --train_data_dir <dir> \
    --output_dir <cache_dir> [--resolution 512] [--batch_size 8] \
    [--depth_conditioning_mode concat] [--save_dtype float16]
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def nearest_resize_hw(x: np.ndarray, hl: int, wl: int) -> np.ndarray:
    """numpy twin of training.train_step.nearest_resize_nhwc for one HWC map."""
    h, w = x.shape[:2]
    ri = (np.arange(hl) * h // hl).astype(np.int64)
    ci = (np.arange(wl) * w // wl).astype(np.int64)
    return x[ri][:, ci]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--pretrained_model_name_or_path", type=str, required=True)
    p.add_argument("--train_data_dir", type=str, required=True)
    p.add_argument("--train_csv", type=str, default="train.csv")
    p.add_argument("--caption_column", type=str, default="auto_caption")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--depth_conditioning_mode", type=str, default="concat",
                   choices=[None, "concat", "latents"])
    p.add_argument("--normals_conditioning_mode", type=str, default=None,
                   choices=[None, "concat", "latents", "ip_adapter"])
    p.add_argument("--save_dtype", type=str, default="float32",
                   choices=["float32", "float16"],
                   help="moments storage dtype (float16 halves disk at "
                        "~1e-3 moment quantization)")
    p.add_argument("--skip_existing", action="store_true")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from reflecting_reality_tpu.core.io import load_pretrained
    from reflecting_reality_tpu.data.loader import DataLoader
    from reflecting_reality_tpu.data.synmirror import HDF5Dataset
    from reflecting_reality_tpu.data.tokenizer import HashTokenizer
    from reflecting_reality_tpu.models.vae import AutoencoderKL

    vae_module, vae_params = load_pretrained(
        AutoencoderKL, args.pretrained_model_name_or_path, subfolder="vae"
    )

    df = pd.read_csv(os.path.join(args.train_data_dir, args.train_csv))
    # captions are not cached; the hash tokenizer is a placeholder so the
    # dataset machinery runs without vocab files
    dataset = HDF5Dataset(
        args.train_data_dir, df, HashTokenizer(),
        resolution=args.resolution,
        proportion_empty_prompts=0.0,
        caption_column=args.caption_column,
        random_flip=False,
        depth=args.depth_conditioning_mode is not None,
        normals_conditioning_mode=args.normals_conditioning_mode or False,
    )
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False,
                        drop_last=False, num_workers=4)

    @jax.jit
    def moments_of(img):
        d = vae_module.apply(vae_params, img, method=vae_module.encode)
        return jnp.concatenate([d.mean, d.logvar], axis=-1)

    os.makedirs(args.output_dir, exist_ok=True)
    save_dtype = np.dtype(args.save_dtype)
    vs = 2 ** (len(vae_module.block_out_channels) - 1)
    hl = wl = args.resolution // vs
    idx = 0
    for batch in loader:
        b = batch["pixel_values"].shape[0]
        rows = df.iloc[idx : idx + b]
        from reflecting_reality_tpu.data.latent_cache import cache_name

        out_names = [
            cache_name(rows.iloc[j], idx + j) for j in range(b)
        ]
        if args.skip_existing and all(
            os.path.exists(os.path.join(args.output_dir, n)) for n in out_names
        ):
            idx += b
            continue

        lat = np.asarray(moments_of(batch["pixel_values"]))
        cond = np.asarray(moments_of(batch["conditioning_pixel_values"]))
        extras = {}
        if args.depth_conditioning_mode == "latents":
            d3 = np.repeat(batch["depths"], 3, axis=-1)
            extras["depth_latent_moments"] = np.asarray(moments_of(d3))
        if args.normals_conditioning_mode == "latents":
            extras["normals_latent_moments"] = np.asarray(moments_of(batch["normals"]))

        for j, name in enumerate(out_names):
            sample = {
                "latent_moments": lat[j].astype(save_dtype),
                "cond_latent_moments": cond[j].astype(save_dtype),
                # mask pre-resized to latent res (nearest; identity under the
                # train step's nearest_resize_nhwc)
                "masks": nearest_resize_hw(batch["masks"][j], hl, wl).astype(np.float32),
            }
            if args.depth_conditioning_mode == "concat":
                sample["depths"] = nearest_resize_hw(
                    batch["depths"][j], hl, wl).astype(np.float32)
            elif args.depth_conditioning_mode == "latents":
                sample["depth_latent_moments"] = (
                    extras["depth_latent_moments"][j].astype(save_dtype))
            if args.normals_conditioning_mode == "concat":
                sample["normals"] = nearest_resize_hw(
                    batch["normals"][j], hl, wl).astype(np.float32)
            elif args.normals_conditioning_mode == "latents":
                sample["normals_latent_moments"] = (
                    extras["normals_latent_moments"][j].astype(save_dtype))
            elif args.normals_conditioning_mode == "ip_adapter":
                sample["normals"] = np.asarray(batch["normals"][j], np.float32)
            np.savez(os.path.join(args.output_dir, name), **sample)
        idx += b
        if idx % (args.batch_size * 20) == 0:
            logger.info("encoded %d / %d samples", idx, len(dataset))
    logger.info("done: %d samples -> %s", idx, args.output_dir)


if __name__ == "__main__":
    main()
