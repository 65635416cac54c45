"""SD-inpainting baseline training driver (reference:
baseline/sd_inpainting/train_sdinpainting.py — same flag surface as the
BrushNet trainer minus the brushnet/ip-adapter knobs; trains the WHOLE
9(+)channel UNet with the inflated conv_in)."""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

from reflecting_reality_tpu.cli.train import (
    JsonlTracker, build_parser, log_to_trackers, make_trackers,
)

logger = logging.getLogger(__name__)


def main(argv=None):
    parser = build_parser()
    parser.description = "SD-inpainting baseline training"
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from reflecting_reality_tpu.baseline.sd_inpainting import (
        baseline_in_channels, inflate_conv_in_params, make_baseline_train_step,
    )
    from reflecting_reality_tpu.core.io import load_pretrained, save_pretrained
    from reflecting_reality_tpu.data.loader import DataLoader, prefetch_to_device
    from reflecting_reality_tpu.data.synmirror import HDF5Dataset, MSDDataset
    from reflecting_reality_tpu.data.tokenizer import CLIPTokenizer
    from reflecting_reality_tpu.models.clip_text import load_text_encoder
    from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
    from reflecting_reality_tpu.models.vae import AutoencoderKL
    from reflecting_reality_tpu.parallel.mesh import make_mesh, replicate_tree
    from reflecting_reality_tpu.training.train_step import TrainConfig

    dtype = {"no": jnp.float32, "fp16": jnp.float32, "bf16": jnp.bfloat16}[
        args.mixed_precision
    ]
    base = args.pretrained_model_name_or_path

    in_ch = baseline_in_channels(args.depth_conditioning_mode,
                                 args.normals_conditioning_mode)
    unet_module, unet_params = load_pretrained(
        UNet2DConditionModel, base, subfolder="unet", dtype=dtype,
        in_channels=in_ch, validate=False,  # conv_in width differs pre-inflation
    )
    # inflate conv_in: loaded kernel still has the pretrained input width
    old_in = np.asarray(unet_params["params"]["conv_in"]["kernel"]).shape[2]
    if old_in != in_ch:
        out_ch = np.asarray(unet_params["params"]["conv_in"]["kernel"]).shape[3]
        unet_params = {"params": inflate_conv_in_params(
            unet_params["params"], (3, 3, in_ch, out_ch), preserve=min(old_in, 9)
        )}
    from reflecting_reality_tpu.core.io import validate_loaded_params

    validate_loaded_params(unet_module, unet_params, where=f"{base}/unet (inflated)")
    vae = load_pretrained(AutoencoderKL, base, subfolder="vae", dtype=dtype)
    text = load_text_encoder(base, dtype=dtype)
    tokenizer = CLIPTokenizer.from_pretrained(base, subfolder="tokenizer")

    df = pd.read_csv(os.path.join(args.train_data_dir, args.train_csv))
    if args.max_train_samples:
        df = df.iloc[: args.max_train_samples]
    ds_cls = {"synmirror": HDF5Dataset, "msd": MSDDataset}[args.dataset_type]
    dataset = ds_cls(
        args.train_data_dir, df, tokenizer, resolution=args.resolution,
        proportion_empty_prompts=args.proportion_empty_prompts,
        mirror_prompt=args.mirror_prompt, caption_column=args.caption_column,
        random_flip=args.random_flip, seed=args.seed,
        depth=args.depth_conditioning_mode is not None,
        normals_conditioning_mode=args.normals_conditioning_mode or False,
    )

    mesh = make_mesh()
    n_dev = len(mesh.devices.flatten())
    global_batch = args.train_batch_size * n_dev
    loader = DataLoader(dataset, global_batch, shuffle=True,
                        num_workers=args.dataloader_num_workers or 8,
                        seed=args.seed or 0)
    if len(loader) == 0:
        raise ValueError("dataset smaller than global batch")

    config = TrainConfig(
        learning_rate=args.learning_rate, scale_lr=args.scale_lr,
        lr_scheduler=args.lr_scheduler, lr_warmup_steps=args.lr_warmup_steps,
        max_train_steps=args.max_train_steps,
        adam_weight_decay=args.adam_weight_decay, adam_epsilon=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm, snr_gamma=args.snr_gamma,
        depth_conditioning_mode=args.depth_conditioning_mode,
        normals_conditioning_mode=args.normals_conditioning_mode,
    )
    step_fn, init_state = make_baseline_train_step(
        unet_module, vae[0], text[0], config, dtype=dtype
    )
    state = replicate_tree(init_state(unet_params, vae[1], text[1]), mesh)
    step_fn = jax.jit(step_fn, donate_argnums=(0,))

    trackers = make_trackers(args)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)

    rng = jax.random.PRNGKey(args.seed or 0)
    step = 0
    t0 = time.time()
    while step < args.max_train_steps:
        for batch in prefetch_to_device(iter(loader), mesh):
            rng, srng = jax.random.split(rng)
            state, metrics = step_fn(state, batch, srng)
            step += 1
            if step % args.log_every == 0:
                m = jax.device_get(metrics)
                log_to_trackers(trackers, {
                    "loss": float(m["loss"]),
                    "steps_per_sec": round(args.log_every / (time.time() - t0), 3),
                }, step)
                t0 = time.time()
            if step % args.checkpointing_steps == 0 or step >= args.max_train_steps:
                path = os.path.join(args.output_dir, f"checkpoint-{step}", "unet")
                save_pretrained(unet_module, jax.device_get(state.unet)["params"], path)
                logger.info("Saved %s", path)
            if step >= args.max_train_steps:
                break
    logger.info("Done at step %d", step)


if __name__ == "__main__":
    main()
