"""Inference driver (reference: examples/brushnet/test_brushnet.py).

Flag-compatible CLI: reads test.csv, loads the MirrorFusion checkpoint(s),
runs the jitted pipeline at 4 seeds per sample, writes 2x2 grid sheets named
uid_cam.png, and supports --all_ckpt sweeps, --ckpt_modulo, predicted-depth
sources (marigold / depth_pro / geowizard), --blended paste-back, MSD
--image_mode, skip-existing resume, and multi-host work sharding
(jax.process_index replaces accelerate.PartialState)."""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import numpy as np

from reflecting_reality_tpu.data.synmirror import (
    MIRROR_PROMPT,
    apply_transforms_depth,
    apply_transforms_normals,
    extract_data_from_hdf5,
    normals_to_uint8,
)
from reflecting_reality_tpu.parallel.mesh import split_between_processes
from reflecting_reality_tpu.pipelines.brushnet_pipeline import StableDiffusionBrushNetPipeline

logger = logging.getLogger(__name__)


# -- predicted-geometry readers (reference test_brushnet.py:22-56) -----------

def read_from_marigold(geometric_data_path, uid, f_name):
    p = os.path.join(geometric_data_path, "marigold", "depth_npy", f"{uid}_{f_name}_pred.npy")
    return np.load(p) if os.path.exists(p) else None


def read_from_depth_pro(geometric_data_path, rel_path):
    p = os.path.join(geometric_data_path, "depth_pro", rel_path.replace(".hdf5", ".npz"))
    if not os.path.exists(p):
        logger.warning("File does not exist: %s", p)
        return None
    return np.load(p)["depth"]


def read_from_geowizard(geometric_data_path, uid, f_name, mode):
    sub = {"depth": "depth_npy", "normal": "normal_npy"}.get(mode)
    if sub is None:
        logger.error("Wrong mode for reading from geowizard: %s", mode)
        return None
    p = os.path.join(geometric_data_path, "geowizard", sub, f"{uid}_{f_name}_pred.npy")
    return np.load(p) if os.path.exists(p) else None


def image_grid(imgs, num_images: int):
    """2-row grid sheet of the per-seed outputs (reference :59-69)."""
    from PIL import Image

    rows = min(2, num_images)
    assert len(imgs) == num_images
    cols = -(-num_images // rows)
    w, h = imgs[0].size
    grid = Image.new("RGB", size=(cols * w, rows * h))
    for i, img in enumerate(imgs):
        grid.paste(img, box=(i % cols * w, i // cols * h))
    return grid


def get_blended_image(gt_image, gen_image, mask):
    """mask region from gen, rest from gt (reference :76-85)."""
    gt_image = gt_image.convert("RGBA")
    gen_image = gen_image.convert("RGBA")
    mask = mask.convert("RGBA")
    from PIL import Image

    blended = Image.blend(gt_image, gen_image, alpha=0.5)
    blended.paste(gen_image, (0, 0), mask)
    return blended


def run_inference(args, brushnet_path: str, output_dir: str, test_df) -> None:
    import h5py
    from PIL import Image
    import jax.numpy as jnp

    dtype = {"fp32": jnp.float32, "fp16": jnp.float32, "bf16": jnp.bfloat16}[args.weight_dtype]
    if args.use_ema:
        # evaluate the EMA shadow weights (checkpoint-N/ema/*, written by
        # train.py --use_ema; rebuild extra — the reference keeps EMA only
        # in accelerate's opaque state and cannot test it directly)
        d = brushnet_path.rstrip("/")
        if os.path.basename(d) == "brushnet":
            d = os.path.dirname(d)
        ema_path = os.path.join(d, "ema", "brushnet")
        if not os.path.isdir(ema_path):
            raise SystemExit(f"--use_ema: no EMA weights at {ema_path}")
        brushnet_path = ema_path
    unet_path = None
    maybe_unet = os.path.join(os.path.dirname(brushnet_path.rstrip("/")), "unet")
    if os.path.basename(brushnet_path.rstrip("/")) == "brushnet" and os.path.isdir(maybe_unet):
        unet_path = maybe_unet

    pipe = StableDiffusionBrushNetPipeline.from_pretrained(
        args.base_model_path,
        brushnet_path=brushnet_path,
        unet_path=unet_path,
        depth_conditioning_mode=args.depth_conditioning_mode,
        normals_conditioning_mode=args.normals_conditioning_mode,
        ip_adapter_scale=args.ip_adapter_scale,
        dtype=dtype,
    )
    if args.weight_dtype == "bf16":
        # reference torch_dtype semantics: half-precision WEIGHTS, not just
        # compute (halves param HBM traffic; VAE stays fp32)
        pipe.cast_params()
    if args.data_parallel:
        # shard the batched-seeds call over the local chips (requires
        # --batch_seeds and num_images_per_validation % n_devices == 0)
        import jax as _jax

        from reflecting_reality_tpu.parallel.mesh import make_mesh

        n = len(_jax.devices())
        if not args.batch_seeds:
            raise SystemExit("--data_parallel requires --batch_seeds")
        if args.num_images_per_validation % n:
            raise SystemExit(
                f"--data_parallel: num_images_per_validation "
                f"({args.num_images_per_validation}) must be divisible by "
                f"the local device count ({n})"
            )
        pipe.enable_data_parallel(make_mesh(n))
    if args.deep_cache:
        pipe.enable_deep_cache(args.deep_cache)
    if args.encoder_reuse:
        pipe.enable_encoder_reuse(args.encoder_reuse)
    if args.int8:
        # W8A8 quantized serving (ops/quant.py): ~1.44x the exact denoise
        # rate on v5e; approximation mode — do not use for parity evals
        from reflecting_reality_tpu.ops.quant import select_all

        pipe.enable_int8(select=select_all if args.int8_all else None)
    if not args.data_parallel:
        # make params device-resident once (enable_data_parallel already
        # replicates); without this every jitted call re-uploads the host
        # param tree as arguments — slow, and wedge-prone on relayed chips
        pipe.place_params()
    os.makedirs(output_dir, exist_ok=True)

    common = dict(
        height=args.resolution,
        width=args.resolution,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.CFG,
        brushnet_conditioning_scale=args.brushnet_conditioning_scale,
        output_type="pil",
    )

    # async device outputs: the pipeline call returns un-fetched uint8 so the
    # drive loop can overlap host work with the device denoise (see drive_rows)
    deferred = dict(common, output_type="device")

    def generate(prompt, validation_image, validation_mask, depth_image, normal_image):
        if args.batch_seeds:
            # all seeds in ONE batched call — ~20% better MXU utilization at
            # batch 4-8 (benchmarks/results.csv denoise_512_bs8). Each batch
            # row draws independent noise, equivalent to the reference's
            # 4-random-seeds protocol (not bit-matched to the sequential
            # per-seed draws).
            return [pipe(
                prompt, validation_image, validation_mask,
                depth=depth_image, normals=normal_image,
                num_images_per_prompt=args.num_images_per_validation,
                seed=args.seed, **deferred,
            )]
        return [
            pipe(prompt, validation_image, validation_mask,
                 depth=depth_image, normals=normal_image,
                 seed=args.seed + k, **deferred)
            for k in range(args.num_images_per_validation)
        ]

    def finalize(handles):
        # blocks on the fetch; device uint8 -> PIL
        return [
            img
            for h in handles
            for img in pipe.image_processor.postprocess(
                np.asarray(h), output_type="pil"
            )
        ]

    drive_rows(args, test_df, output_dir, generate, finalize)


def drive_rows(args, test_df, output_dir, generate, finalize=None) -> None:
    """The reference per-row drive (test_brushnet.py:163-266), shared by the
    MirrorFusion and SD-inpainting-baseline testers: multi-host work split,
    HDF5/MSD sample assembly, predicted-geometry sources, skip-existing
    resume, --blended paste-back, and 2xN grid sheets.  `generate(prompt,
    image, mask, depth, normals) -> [PIL]` supplies the model.

    With `finalize`, `generate` returns an opaque handle of un-fetched device
    work instead and `finalize(handle) -> [PIL]` blocks on it; the loop then
    runs a ONE-DEEP software pipeline — sample i's host prep, fetch, and grid
    save overlap sample i+1's device denoise (JAX dispatch is async), hiding
    the ~1 s/sample of host-side work behind the scan."""
    import h5py
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)

    summarize = None
    if args.summarizer:
        # long-caption summarization before CLIP (reference test_brushnet.py
        # :128-131,192-193: distilbart over the prefixed prompt)
        from reflecting_reality_tpu.tools.summarize_captions import summarize_fn

        summarize = summarize_fn(args.summarizer)

    def write_out(outs, out_path, gt_image, validation_mask):
        images = []
        for out in outs:
            if args.blended:
                out = get_blended_image(gt_image, out, validation_mask.convert("L"))
            images.append(out.convert("RGB"))
        image_grid(images, args.num_images_per_validation).save(out_path)

    pending = None
    indices = split_between_processes(list(range(len(test_df))))
    for index in indices:
        row = test_df.iloc[index]
        caption = str(row[args.caption_column])
        uid = row["uid"]
        depth_image = None
        normal_image = None
        prompt = args.mirror_prompt + caption
        if summarize is not None:
            prompt = summarize(prompt)

        if args.image_mode:
            img_path = os.path.join(args.train_data_dir, "images", str(row["path"]))
            mask_path = os.path.join(args.train_data_dir, "masks", str(row["path"]))
            gt_image = Image.open(img_path)
            validation_mask = Image.open(mask_path).convert("L")
            black = Image.new("RGB", gt_image.size, "black")
            validation_image = Image.composite(black, gt_image, validation_mask)
            f_name = "0"
            out_name = f"{uid}.png"
            if args.depth_conditioning_mode is not None:
                depth_path = os.path.join(
                    args.train_data_dir, "depth", str(row["path"]).replace(".png", ".npz")
                )
                depth_image = apply_transforms_depth(
                    np.load(depth_path)["depth"], np.array(validation_mask),
                    resolution=args.resolution,
                )
            validation_mask = validation_mask.convert("RGB")
        else:
            rel_path = str(row["path"])
            f_name = os.path.split(rel_path)[1].split(".")[0]
            out_name = f"{uid}_{f_name}.png"
            with h5py.File(os.path.join(args.train_data_dir, rel_path), "r") as f:
                data = extract_data_from_hdf5(f)
            gt_image = Image.fromarray(data["image"], mode="RGB")
            validation_image = Image.fromarray(data["masked_image"], mode="RGB")
            validation_mask = Image.fromarray(data["mask"]).convert("RGB")

            if args.depth_conditioning_mode is not None:
                if args.depth_source == "gt":
                    raw_depth = data["depth"]
                elif args.depth_source == "marigold":
                    raw_depth = read_from_marigold(args.geometric_input_data_dir, uid, f_name)
                elif args.depth_source == "depth_pro":
                    raw_depth = read_from_depth_pro(args.geometric_input_data_dir, rel_path)
                else:
                    raise ValueError(args.depth_source)
                if raw_depth is None:
                    logger.error("%s depth missing for %s_%s", args.depth_source, uid, f_name)
                    continue
                depth_image = apply_transforms_depth(
                    raw_depth, data["mask"], resolution=args.resolution
                )
            if args.normals_conditioning_mode is not None:
                if args.normal_source == "gt":
                    raw_normals = data["normals"]
                else:
                    raw_normals = read_from_geowizard(
                        args.geometric_input_data_dir, uid, f_name, mode="normal"
                    )
                    if raw_normals is None:
                        logger.error("geowizard normals missing for %s_%s", uid, f_name)
                        continue
                if args.normals_conditioning_mode == "ip_adapter":
                    # (1, 3) unit mean mirror normal, not an image
                    # (dataset.py:168-192 ip_adapter transform)
                    normal_image = apply_transforms_normals(
                        raw_normals, mask=data["mask"],
                        normals_conditioning_mode="ip_adapter",
                    )
                else:
                    normal_image = Image.fromarray(
                        normals_to_uint8(raw_normals), mode="RGB"
                    )

        out_path = os.path.join(output_dir, out_name)
        if os.path.exists(out_path):  # idempotent restart (reference :182-185)
            continue

        outs = generate(prompt, validation_image, validation_mask,
                        depth_image, normal_image)
        if finalize is None:
            write_out(outs, out_path, gt_image, validation_mask)
        else:
            # one-deep pipeline: enqueue this row, then drain the previous
            # one while the device is busy with this row's denoise
            if pending is not None:
                write_out(finalize(pending[0]), *pending[1:])
            pending = (outs, out_path, gt_image, validation_mask)
    if finalize is not None and pending is not None:
        write_out(finalize(pending[0]), *pending[1:])


def main(argv=None):
    import pandas as pd

    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from reflecting_reality_tpu.core.jit_cache import enable_compilation_cache

    enable_compilation_cache(args.compilation_cache_dir)

    from reflecting_reality_tpu.ops.attention import set_attention_backend

    # flash by default — 2.7x at the 4096-token self-attention, mandatory
    # at 1024² (16384 tokens OOMs the einsum path); short/wide shapes still
    # route to XLA inside dot_product_attention
    set_attention_backend(args.attention_backend)

    test_df = pd.read_csv(os.path.join(args.train_data_dir, args.csv))
    if args.infer_list:
        with open(args.infer_list) as f:
            infer_list = [x.strip() for x in f.readlines()]
        test_df = test_df[test_df["path"].isin(infer_list)]
        print(f"Processing {len(test_df)} files from the list.")
    if not args.infer_list and args.num_samples:
        test_df = test_df.sample(args.num_samples, random_state=args.seed)

    if args.all_ckpt:
        # sweep every checkpoint-N under brushnet_path (reference :269-283)
        from reflecting_reality_tpu.training.checkpoint import checkpoint_steps

        for step in checkpoint_steps(args.brushnet_path):
            if args.ckpt_modulo and step % args.ckpt_modulo != 0:
                continue
            ckpt = os.path.join(args.brushnet_path, f"checkpoint-{step}")
            run_inference(
                args, os.path.join(ckpt, "brushnet"),
                args.output_dir or os.path.join(ckpt, "inference"), test_df,
            )
    else:
        brushnet_path = args.brushnet_path
        if os.path.isdir(os.path.join(brushnet_path, "brushnet")):
            brushnet_path = os.path.join(brushnet_path, "brushnet")
        run_inference(
            args, brushnet_path,
            args.output_dir or os.path.join(os.path.dirname(brushnet_path), "inference"),
            test_df,
        )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MirrorFusion inference")
    p.add_argument("--brushnet_path", type=str, required=True)
    p.add_argument("--weight_dtype", type=str, default="fp32",
                   choices=["fp32", "fp16", "bf16"])
    p.add_argument("--base_model_path", type=str,
                   default="runwayml/stable-diffusion-v1-5")
    p.add_argument("--brushnet_conditioning_scale", type=float, default=1.0)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--CFG", type=float, default=7.5)
    p.add_argument("--mirror_prompt", type=str, default=MIRROR_PROMPT)
    p.add_argument("--summarizer", type=str, default=None,
                   help="summarization model for long prompts, e.g. "
                        "sshleifer/distilbart-cnn-6-6 (reference :298-301)")
    p.add_argument("--num_images_per_validation", type=int, default=4)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batched-seeds generation over all local "
                        "chips (one jitted SPMD program; needs --batch_seeds "
                        "and seeds %% n_devices == 0)")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 quantized serving (ops/quant.py): ~1.44x the "
                        "exact denoise rate on v5e; approximation mode")
    p.add_argument("--int8_all", action="store_true",
                   help="with --int8: quantize EVERY kernel (ops.quant."
                        "select_all) instead of only MXU-payoff sizes — for "
                        "quality evals on tiny configs where the default "
                        "policy selects nothing")
    p.add_argument("--deep_cache", type=int, default=None,
                   help="DeepCache interval (approximation mode — do not "
                        "use for parity evals)")
    p.add_argument("--encoder_reuse", type=int, default=None,
                   help="encoder-reuse interval (approximation mode; "
                        "mutually exclusive with --deep_cache)")
    p.add_argument("--use_ema", action="store_true",
                   help="load the EMA shadow weights (checkpoint-N/ema/) "
                        "instead of the raw trained weights")
    p.add_argument("--batch_seeds", action="store_true",
                   help="generate all seeds in one batched pipeline call "
                        "(~20%% faster per image at batch 4-8; independent "
                        "noise per row, not bit-matched to sequential seeds)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--compilation_cache_dir", type=str, default=None,
                   help="persistent XLA compilation cache (kills the ~190s "
                        "cold compile of the 1024 pipeline on reruns)")
    p.add_argument("--attention_backend", type=str, default="flash",
                   choices=["flash", "xla"],
                   help="attention kernel: 'flash' (Pallas, 2.7x at 4096 "
                        "tokens, mandatory at 1024²) or 'xla' (einsum)")
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--train_data_dir", type=str, default="data/blenderproc")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--csv", type=str, default="test.csv")
    p.add_argument("--caption_column", type=str, default="auto_caption")
    p.add_argument("--blended", action="store_true")
    p.add_argument("--all_ckpt", action="store_true")
    p.add_argument("--ckpt_modulo", type=int, default=None)
    p.add_argument("--image_mode", action="store_true")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--depth_conditioning_mode", type=str, default=None,
                   choices=[None, "concat", "latents"])
    p.add_argument("--normals_conditioning_mode", type=str, default=None,
                   choices=[None, "concat", "latents", "ip_adapter"])
    p.add_argument("--ip_adapter_scale", type=float, default=1.0)
    p.add_argument("--geometric_input_data_dir", type=str, default=None)
    p.add_argument("--depth_source", type=str, default="gt",
                   choices=["gt", "marigold", "depth_pro", "geowizard"])
    p.add_argument("--normal_source", type=str, default="gt",
                   choices=["gt", "geowizard"])
    p.add_argument("--hint_map_dir", type=str, default=None)
    p.add_argument("--infer_list", type=str, default=None)
    return p


if __name__ == "__main__":
    main()
