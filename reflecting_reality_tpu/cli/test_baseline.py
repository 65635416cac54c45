"""SD-inpainting baseline inference driver (reference:
baseline/sd_inpainting/test_sdinpainting.py — same surface as the BrushNet
tester but driving the 9(+)channel inpainting UNet pipeline)."""

from __future__ import annotations

import logging
import os

import numpy as np

from reflecting_reality_tpu.cli.test import build_parser, image_grid
from reflecting_reality_tpu.data.synmirror import apply_transforms_depth, extract_data_from_hdf5
from reflecting_reality_tpu.parallel.mesh import split_between_processes

logger = logging.getLogger(__name__)


def main(argv=None):
    import h5py
    import jax.numpy as jnp
    import pandas as pd
    from PIL import Image

    parser = build_parser()
    parser.description = "SD-inpainting baseline inference"
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from reflecting_reality_tpu.baseline.sd_inpainting import SDInpaintingPipeline
    from reflecting_reality_tpu.core.io import load_pretrained
    from reflecting_reality_tpu.data.tokenizer import CLIPTokenizer
    from reflecting_reality_tpu.models.clip_text import load_text_encoder
    from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
    from reflecting_reality_tpu.models.vae import AutoencoderKL

    dtype = {"fp32": jnp.float32, "fp16": jnp.float32, "bf16": jnp.bfloat16}[
        args.weight_dtype
    ]
    unet_path = args.brushnet_path  # reuses the flag: checkpoint-N/unet
    if os.path.isdir(os.path.join(unet_path, "unet")):
        unet_path = os.path.join(unet_path, "unet")
    unet = load_pretrained(UNet2DConditionModel, unet_path, dtype=dtype)
    vae = load_pretrained(AutoencoderKL, args.base_model_path, subfolder="vae", dtype=dtype)
    text = load_text_encoder(args.base_model_path, dtype=dtype)
    tokenizer = CLIPTokenizer.from_pretrained(args.base_model_path, subfolder="tokenizer")

    pipe = SDInpaintingPipeline(
        vae=vae, text_encoder=text, tokenizer=tokenizer, unet=unet,
        depth_conditioning_mode=args.depth_conditioning_mode,
        normals_conditioning_mode=args.normals_conditioning_mode,
        dtype=dtype,
    )

    test_df = pd.read_csv(os.path.join(args.train_data_dir, args.csv))
    if args.num_samples:
        test_df = test_df.sample(args.num_samples, random_state=args.seed)
    output_dir = args.output_dir or os.path.join(os.path.dirname(unet_path), "inference")
    os.makedirs(output_dir, exist_ok=True)

    for index in split_between_processes(list(range(len(test_df)))):
        row = test_df.iloc[index]
        uid = row["uid"]
        rel_path = str(row["path"])
        f_name = os.path.split(rel_path)[1].split(".")[0]
        out_path = os.path.join(output_dir, f"{uid}_{f_name}.png")
        if os.path.exists(out_path):
            continue
        with h5py.File(os.path.join(args.train_data_dir, rel_path), "r") as f:
            data = extract_data_from_hdf5(f)
        depth = None
        if args.depth_conditioning_mode is not None:
            depth = apply_transforms_depth(data["depth"], data["mask"],
                                           resolution=args.resolution)
        prompt = args.mirror_prompt + str(row[args.caption_column])
        images = []
        for k in range(args.num_images_per_validation):
            out = pipe(
                prompt,
                Image.fromarray(data["masked_image"]),
                Image.fromarray(data["mask"]).convert("RGB"),
                depth=depth,
                height=args.resolution, width=args.resolution,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.CFG, seed=args.seed + k,
                output_type="pil",
            )[0]
            images.append(out.convert("RGB"))
        image_grid(images, args.num_images_per_validation).save(out_path)


if __name__ == "__main__":
    main()
