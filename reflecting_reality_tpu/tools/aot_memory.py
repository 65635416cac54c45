"""AOT memory proof for the real-shape multi-chip training step.

Compiles (never runs) the FULL SD-1.5-sized sharded MirrorFusion train step
over an n-device mesh with jit(...).lower(...).compile() on shape structs —
no weights are materialized — and reports XLA's CompiledMemoryStats, i.e.
the per-device HBM the program would need: argument bytes (params + opt
state + batch) and temp bytes (activations + workspace under the chosen
remat policy).

This substantiates docs/SCALING.md's HBM-budget table for the reference
training recipe (bs 2/chip at 512², frozen base UNet, AdamW + EMA —
reference slurm/train.sh:23-41).  Two platforms:

- `--platform tpu` (authoritative): compile the per-chip program on the
  real chip; under pure DP the n-way job's per-chip program is identical
  up to a negligible grad-psum buffer.  A compile-time "Ran out of memory
  in memory space hbm: used X of 15.75G" error is itself the measurement.
- `--platform cpu` (default; the driver's dryrun environment): validates
  the SHARDED program structure on a virtual n-device mesh, but CPU buffer
  assignment has no TPU scheduling/remat accounting and OVERSTATES memory
  ~2x — do not quote its numbers as HBM budgets.

Usage:
    python -m reflecting_reality_tpu.tools.aot_memory --platform tpu \\
        [--batch_per_chip 2] [--resolution 512] [--policy dots|full] \\
        [--train_base_unet] [--no_ema] [--ema_dtype bf16] [--frozen_fp32]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp


def _sds(tree, sharding):
    """Pytree -> ShapeDtypeStructs with the given sharding attached."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding), tree
    )


def analyze(n_devices: int = 8, batch_per_chip: int = 2, resolution: int = 512,
            policy: str = "dots", train_base_unet: bool = False,
            use_ema: bool = True, compute_dtype=jnp.bfloat16, tiny: bool = False,
            frozen_bf16: bool = True, ema_dtype: str = "fp32"):
    """Compile the sharded train step at full shape; return stats dict.

    tiny=True swaps in the dryrun-sized models (plumbing smoke test only)."""
    from reflecting_reality_tpu.models.brushnet import BrushNetModel
    from reflecting_reality_tpu.models.clip_text import CLIPTextModel
    from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
    from reflecting_reality_tpu.models.vae import AutoencoderKL
    from reflecting_reality_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated,
    )
    from reflecting_reality_tpu.training.train_step import TrainConfig, make_train_step

    # SD-1.5 production configs (class defaults = real config.json values)
    if tiny:
        cfg = dict(block_out_channels=(8, 16, 16, 16), attention_head_dim=2,
                   cross_attention_dim=768, norm_num_groups=4, layers_per_block=2)
        unet = UNet2DConditionModel(dtype=compute_dtype, **cfg)
        brushnet = BrushNetModel(conditioning_channels=6, dtype=compute_dtype, **cfg)
        vae = AutoencoderKL(block_out_channels=(4, 4, 4, 4), norm_num_groups=2,
                            dtype=compute_dtype)
        text = CLIPTextModel(hidden_size=768, num_hidden_layers=1,
                             num_attention_heads=2, intermediate_size=32,
                             dtype=compute_dtype)
    else:
        unet = UNet2DConditionModel(dtype=compute_dtype)
        brushnet = BrushNetModel(conditioning_channels=6, dtype=compute_dtype)
        vae = AutoencoderKL(dtype=compute_dtype)
        text = CLIPTextModel(dtype=compute_dtype)

    config = TrainConfig(
        train_base_unet=train_base_unet,
        use_ema=use_ema,
        ema_dtype=ema_dtype,
        gradient_checkpointing=True,
        gradient_checkpointing_policy=policy,
        snr_gamma=None,
        depth_conditioning_mode="concat",
    )
    step_fn, init_state = make_train_step(unet, brushnet, vae, text, config)

    # fp32 master params, as the trainer keeps them (reference mixed-precision
    # policy train_brushnet_mirror.py:1125-1167) — via eval_shape, zero bytes.
    rng = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, resolution // 8, resolution // 8, 4), compute_dtype)
    t0 = jnp.zeros((1,), jnp.int32)
    ehs = jnp.zeros((1, 77, 768), compute_dtype)
    u_sd = jax.eval_shape(lambda r: unet.init(r, lat, t0, ehs), rng)
    b_sd = jax.eval_shape(
        lambda r: brushnet.init(
            r, lat, t0, ehs,
            jnp.zeros((1, resolution // 8, resolution // 8, 6), compute_dtype)),
        rng)
    v_sd = jax.eval_shape(
        lambda r: vae.init(r, jnp.zeros((1, 64, 64, 3), compute_dtype),
                           jax.random.PRNGKey(1)), rng)
    t_sd = jax.eval_shape(
        lambda r: text.init(r, jnp.zeros((1, 77), jnp.int32)), rng)

    def as_dtype(sd, dt):
        return jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape, dt if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype),
            sd)

    # trainables are fp32 master weights; frozen modules follow the
    # reference mixed-precision policy (bf16 storage) unless frozen_bf16=False
    frozen_dt = jnp.bfloat16 if frozen_bf16 else jnp.float32
    u_dt = jnp.float32 if train_base_unet else frozen_dt
    state_sd = jax.eval_shape(
        init_state, as_dtype(b_sd, jnp.float32), as_dtype(u_sd, u_dt),
        as_dtype(v_sd, frozen_dt), as_dtype(t_sd, frozen_dt))

    mesh = make_mesh(n_devices)
    repl, bsh = replicated(mesh), batch_sharding(mesh)
    state_in = _sds(state_sd, repl)

    B = n_devices * batch_per_chip
    H = W = resolution
    batch_in = {
        "pixel_values": jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32, sharding=bsh),
        "conditioning_pixel_values": jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32, sharding=bsh),
        "masks": jax.ShapeDtypeStruct((B, H, W, 1), jnp.float32, sharding=bsh),
        "depths": jax.ShapeDtypeStruct((B, H, W, 1), jnp.float32, sharding=bsh),
        "input_ids": jax.ShapeDtypeStruct((B, 77), jnp.int32, sharding=bsh),
    }
    rng_in = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=repl)

    # donate_argnums=(0,) matches the trainer (cli/train.py): the new state
    # aliases the old in place, so peak HBM = args + temps, not 2x state.
    compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(
        state_in, batch_in, rng_in).compile()
    ma = compiled.memory_analysis()
    gib = 1024 ** 3
    stats = {
        "n_devices": n_devices,
        "batch_per_chip": batch_per_chip,
        "resolution": resolution,
        "remat_policy": policy,
        "train_base_unet": train_base_unet,
        "use_ema": use_ema,
        "ema_dtype": ema_dtype,
        "frozen_bf16": frozen_bf16,
        "argument_gib_per_device": round(ma.argument_size_in_bytes / gib, 3),
        "temp_gib_per_device": round(ma.temp_size_in_bytes / gib, 3),
        "output_gib_per_device": round(ma.output_size_in_bytes / gib, 3),
        "alias_gib_per_device": round(ma.alias_size_in_bytes / gib, 3),
        # donation aliases outputs onto arguments; peak = args + temps
        "peak_gib_per_device": round(
            (ma.argument_size_in_bytes + ma.temp_size_in_bytes
             + ma.output_size_in_bytes - ma.alias_size_in_bytes) / gib, 3),
        "v5e_hbm_gib": 16.0,
    }
    stats["fits_v5e"] = stats["peak_gib_per_device"] < 15.75
    return stats


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n_devices", type=int, default=8)
    p.add_argument("--batch_per_chip", type=int, default=2)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--policy", choices=["dots", "full"], default="dots")
    p.add_argument("--train_base_unet", action="store_true")
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--frozen_fp32", action="store_true",
                   help="keep frozen modules in fp32 storage (default bf16, "
                        "the reference mixed-precision policy)")
    p.add_argument("--ema_dtype", choices=["fp32", "bf16"], default="fp32")
    p.add_argument("--platform", choices=["cpu", "tpu"], default="cpu",
                   help="cpu: virtual n-device mesh — validates the SHARDED "
                        "program structure, but CPU buffer assignment "
                        "OVERSTATES TPU memory (no TPU scheduling/remat "
                        "accounting).  tpu: compile the per-chip program on "
                        "the real chip (n_devices=1 mesh) — authoritative "
                        "HBM numbers; under pure DP the per-chip program of "
                        "the n-way job is identical up to a negligible "
                        "grad-psum buffer.")
    args = p.parse_args(argv)

    import os

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.n_devices}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
        n = args.n_devices
    else:
        n = 1  # per-chip program on the real chip

    stats = analyze(n, args.batch_per_chip, args.resolution,
                    args.policy, args.train_base_unet, not args.no_ema,
                    frozen_bf16=not args.frozen_fp32, ema_dtype=args.ema_dtype)
    stats["platform"] = args.platform
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
