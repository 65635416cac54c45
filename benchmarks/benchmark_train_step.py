"""Training-step throughput at the reference recipe (bs/chip=2, 512², bf16).

One jitted SPMD train step (VAE encode -> conditioning assembly -> DDPM noise
-> CLIP encode -> dual-branch forward -> MSE -> AdamW over brushnet), i.e.
the reference hot loop train_brushnet_mirror.py:1346-1523 as compiled by
training.train_step.  Frozen base UNet (the 8-GPU recipe), depth concat.

Two-point chained timing: a jitted fori_loop carrying TrainState over n
steps, timed at two n values.

Usage: python benchmarks/benchmark_train_step.py [--batch 2] [--remat]
"""

import argparse
import csv
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache

enable_default_compilation_cache()

from reflecting_reality_tpu.models.brushnet import BrushNetModel
from reflecting_reality_tpu.models.clip_text import CLIPTextModel
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL
from reflecting_reality_tpu.ops.attention import set_attention_backend
from reflecting_reality_tpu.training.train_step import TrainConfig, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat_policy", type=str, default="full", choices=["full", "dots"])
    ap.add_argument("--cached_latents", action="store_true",
                    help="feed precomputed VAE moments (tools/precompute_latents.py "
                         "path) instead of pixels — skips both in-step encodes")
    ap.add_argument("--ema", action="store_true",
                    help="include the EMA shadow update (bf16 storage) -- the "
                         "E2E launcher config; costs HBM headroom, so the "
                         "no-EMA rows are NOT comparable to EMA runs")
    ap.add_argument("--frozen_fp32", action="store_true",
                    help="keep FROZEN params (unet/vae/text) in fp32 storage; "
                         "default stores them bf16 per the reference "
                         "mixed-precision policy (train_brushnet_mirror.py:"
                         "1125-1167) — frees ~2.5 GB, the bs=2 -> bs=4 margin")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "results.csv"))
    args = ap.parse_args()

    set_attention_backend("flash")
    dtype = jnp.bfloat16
    H = W = args.resolution

    unet = UNet2DConditionModel(dtype=dtype)
    brushnet = BrushNetModel(conditioning_channels=6, dtype=dtype)
    vae = AutoencoderKL(dtype=dtype)
    text = CLIPTextModel(dtype=dtype)

    r = jax.random.split(jax.random.PRNGKey(0), 4)
    sample = jnp.zeros((1, 64, 64, 4), dtype)
    t0s = jnp.zeros((1,), jnp.int32)
    ehs = jnp.zeros((1, 77, 768), dtype)
    print("init...", flush=True)
    uparams = jax.jit(unet.init)(r[0], sample, t0s, ehs)
    bparams = jax.jit(brushnet.init)(r[1], sample, t0s, ehs, jnp.zeros((1, 64, 64, 6), dtype))
    vparams = jax.jit(vae.init)(r[2], jnp.zeros((1, 256, 256, 3), dtype), jax.random.PRNGKey(9))
    tparams = jax.jit(text.init)(r[3], jnp.zeros((1, 77), jnp.int32))

    config = TrainConfig(
        learning_rate=1e-5, depth_conditioning_mode="concat",
        gradient_checkpointing=args.remat,
        gradient_checkpointing_policy=args.remat_policy,
        use_ema=args.ema, ema_dtype="bf16" if args.ema else "fp32",
    )
    step_fn, init_state = make_train_step(unet, brushnet, vae, text, config, dtype=dtype)
    if not args.frozen_fp32:
        from reflecting_reality_tpu.core.io import cast_floating

        uparams = cast_floating(uparams, jnp.bfloat16)   # frozen base unet
        vparams = cast_floating(vparams, jnp.bfloat16)
        tparams = cast_floating(tparams, jnp.bfloat16)
    state = init_state(bparams, uparams, vparams, tparams)

    b = args.batch
    rs = np.random.RandomState(0)
    if args.cached_latents:
        hl = wl = H // 8
        batch = {
            "latent_moments": jnp.asarray(rs.randn(b, hl, wl, 8), jnp.float32),
            "cond_latent_moments": jnp.asarray(rs.randn(b, hl, wl, 8), jnp.float32),
            "masks": jnp.asarray((rs.rand(b, hl, wl, 1) > 0.5), jnp.float32),
            "depths": jnp.asarray(rs.randn(b, hl, wl, 1), jnp.float32),
            "input_ids": jnp.asarray(rs.randint(0, 49408, (b, 77)), jnp.int32),
        }
    else:
        batch = {
            "pixel_values": jnp.asarray(rs.randn(b, H, W, 3), jnp.float32),
            "conditioning_pixel_values": jnp.asarray(rs.randn(b, H, W, 3), jnp.float32),
            "masks": jnp.asarray((rs.rand(b, H, W, 1) > 0.5), jnp.float32),
            "depths": jnp.asarray(rs.randn(b, H, W, 1), jnp.float32),
            "input_ids": jnp.asarray(rs.randint(0, 49408, (b, 77)), jnp.int32),
        }

    import functools

    def chain(n):
        # donate the state (params + opt state ≈ 9 GB fp32) — without
        # donation input+output state double-buffers and the program OOMs.
        # Returning the full state keeps the optimizer updates live (no DCE).
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(state, rng):
            def body(i, carry):
                state, rng = carry
                rng, sub = jax.random.split(rng)
                state, _ = step_fn(state, batch, sub)
                return (state, rng)
            state, _ = jax.lax.fori_loop(0, n, body, (state, rng))
            return state
        return run

    def sync(state):
        np.asarray(jax.tree_util.tree_leaves(state.trainable)[0])
        return state

    # Per-step FLOPs for MFU/HFU.  XLA's cost_analysis of the ACTUAL-batch
    # program proved unreliable across batch sizes (the bs=8 lowering once
    # reported 2.73x the bs=4 flops and a >100% "MFU").  Per-SAMPLE flops is
    # batch-invariant by definition, so derive it from small-batch lowerings
    # and require linearity: per_sample = flops(bs=2)/2, checked against
    # flops(bs=1) within 10%.  MFU uses MODEL flops (no-remat program — the
    # algorithmic work); HFU uses the as-compiled config incl. remat
    # recompute, derived the same batch-invariant way.
    V5E_PEAK_FLOPS = 197e12  # v5e bf16 peak per chip

    def _small_batch(nb):
        sb = {k: v[:nb] for k, v in batch.items()}
        sb_state = state  # params/opt state are batch-independent
        return sb_state, sb

    def _flops_of(fn, nb):
        try:
            st, sb = _small_batch(nb)
            ca = jax.jit(fn).lower(st, sb, jax.random.PRNGKey(0)
                                   ).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float(ca.get("flops", 0.0)) or None
        except Exception as e:  # cost model availability varies per backend
            print(f"cost_analysis unavailable (bs={nb}): {e}", flush=True)
            return None

    def _per_sample(fn, label):
        f1, f2 = _flops_of(fn, 1), _flops_of(fn, 2)
        if not (f1 and f2):
            return None
        ratio = f2 / f1
        if not 1.8 <= ratio <= 2.2:
            raise AssertionError(
                f"{label} flops not batch-linear: bs1={f1:.3e} bs2={f2:.3e} "
                f"(ratio {ratio:.2f}); refusing to publish an MFU from an "
                "inconsistent cost model")
        return f2 / 2.0

    no_remat_cfg = TrainConfig(
        learning_rate=1e-5, depth_conditioning_mode="concat",
        gradient_checkpointing=False,
    )
    nr_step, _ = make_train_step(unet, brushnet, vae, text, no_remat_cfg,
                                 dtype=dtype)
    ps_model = _per_sample(nr_step, "model (no-remat)")
    ps_hw = _per_sample(step_fn, "hardware (as-configured)") if args.remat else ps_model
    model_flops = ps_model * b if ps_model else None
    hw_flops = ps_hw * b if ps_hw else None

    n1, n2 = 3, 13
    f1, f2 = chain(n1), chain(n2)
    print("compiling...", flush=True)
    state = sync(f1(state, jax.random.PRNGKey(1)))
    state = sync(f2(state, jax.random.PRNGKey(1)))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); state = sync(f1(state, jax.random.PRNGKey(2))); t1 = time.time() - t0
        t0 = time.time(); state = sync(f2(state, jax.random.PRNGKey(2))); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (n2 - n1))
    sps = 1.0 / best
    note = (f"train step bs={b} frozen-unet depth-concat"
            + (" ema-bf16" if args.ema else "")
            + ("" if args.frozen_fp32 else " frozen-bf16")
            + (" remat" if args.remat else "")
            + (f" policy={args.remat_policy}" if args.remat and args.remat_policy != "full" else "")
            + (" cached-latents" if args.cached_latents else ""))
    if model_flops:
        mfu = model_flops * sps / V5E_PEAK_FLOPS
        hfu = (hw_flops or model_flops) * sps / V5E_PEAK_FLOPS
        if mfu > 1.0 or hfu > 1.0:
            raise AssertionError(
                f"impossible utilization MFU={mfu:.1%} HFU={hfu:.1%} "
                f"(peak {V5E_PEAK_FLOPS/1e12:.0f} TF/s bf16): either the "
                "flops accounting or the timing is wrong; not publishing")
        note += f" flops/step={model_flops:.3e} MFU={mfu:.1%} (peak 197TF bf16)"
        if hw_flops and hw_flops != model_flops:
            note += f" HFU={hfu:.1%}"
    print(f"{sps:.2f} train steps/s ({b * sps:.2f} samples/s) — {note}", flush=True)
    with open(args.out, "a", newline="") as f:
        csv.writer(f).writerow(
            [f"train_step_{args.resolution}_bs{b}"
             + ("_ema" if args.ema else "")
             + ("_remat" if args.remat else "")
             + (f"_{args.remat_policy}" if args.remat and args.remat_policy != "full" else "")
             + ("_cached" if args.cached_latents else ""),
             args.resolution, b, "bf16", round(sps, 2), round(b * sps, 3), note]
        )


if __name__ == "__main__":
    main()
