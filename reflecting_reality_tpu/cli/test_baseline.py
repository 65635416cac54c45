"""SD-inpainting baseline inference driver (reference:
baseline/sd_inpainting/test_sdinpainting.py — the same surface as the
BrushNet tester, driving the 9(+)-channel inpainting UNet pipeline).

Reuses the full shared drive (cli/test.drive_rows): multi-host work split,
HDF5/MSD sample assembly, predicted depth sources, --blended paste-back,
skip-existing resume, 2xN grids, and --all_ckpt/--ckpt_modulo sweeps —
so the baseline flows through the identical metrics protocol downstream."""

from __future__ import annotations

import logging
import os

from reflecting_reality_tpu.cli.test import build_parser, drive_rows

logger = logging.getLogger(__name__)


def run_inference(args, unet_path: str, output_dir: str, test_df) -> None:
    import jax.numpy as jnp

    from reflecting_reality_tpu.baseline.sd_inpainting import SDInpaintingPipeline
    from reflecting_reality_tpu.core.io import load_pretrained
    from reflecting_reality_tpu.data.tokenizer import CLIPTokenizer
    from reflecting_reality_tpu.models.clip_text import load_text_encoder
    from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
    from reflecting_reality_tpu.models.vae import AutoencoderKL

    dtype = {"fp32": jnp.float32, "fp16": jnp.float32, "bf16": jnp.bfloat16}[
        args.weight_dtype
    ]
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

    def generate(prompt, validation_image, validation_mask, depth_image, normal_image):
        # un-fetched device outputs; drive_rows overlaps the fetch + grid
        # save with the next sample's denoise (see cli/test.py)
        return [
            pipe(
                prompt, validation_image, validation_mask,
                depth=depth_image, normals=normal_image,
                height=args.resolution, width=args.resolution,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.CFG, seed=args.seed + k,
                output_type="device",
            )
            for k in range(args.num_images_per_validation)
        ]

    def finalize(handles):
        import numpy as np

        return [
            img
            for h in handles
            for img in pipe.image_processor.postprocess(
                np.asarray(h), output_type="pil"
            )
        ]

    drive_rows(args, test_df, output_dir, generate, finalize)


def _resolve_unet(path: str) -> str:
    return os.path.join(path, "unet") if os.path.isdir(os.path.join(path, "unet")) else path


def main(argv=None):
    import pandas as pd

    parser = build_parser()
    parser.description = "SD-inpainting baseline inference"
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from reflecting_reality_tpu.core.jit_cache import enable_compilation_cache

    enable_compilation_cache(args.compilation_cache_dir)

    test_df = pd.read_csv(os.path.join(args.train_data_dir, args.csv))
    if args.infer_list:
        with open(args.infer_list) as f:
            infer_list = [x.strip() for x in f.readlines()]
        test_df = test_df[test_df["path"].isin(infer_list)]
    if not args.infer_list and args.num_samples:
        test_df = test_df.sample(args.num_samples, random_state=args.seed)

    root = args.brushnet_path  # reuses the flag (reference --unet_path)
    if args.all_ckpt:
        from reflecting_reality_tpu.training.checkpoint import checkpoint_steps

        for step in checkpoint_steps(root):
            if args.ckpt_modulo and step % args.ckpt_modulo != 0:
                continue
            ckpt = os.path.join(root, f"checkpoint-{step}")
            run_inference(
                args, _resolve_unet(ckpt),
                args.output_dir or os.path.join(ckpt, "inference"), test_df,
            )
    else:
        unet_path = _resolve_unet(root)
        run_inference(
            args, unet_path,
            args.output_dir or os.path.join(os.path.dirname(unet_path), "inference"),
            test_df,
        )


if __name__ == "__main__":
    main()
