"""Training driver (reference: examples/brushnet/train_brushnet_mirror.py).

Flag-compatible CLI around the TPU-native pieces: SD-1.5 component loading,
BrushNet `from_unet` weight surgery, SynMirror dataset + threaded loader with
device prefetch, one jitted SPMD train step over the data mesh, reference-
layout checkpointing with total-limit pruning + custom step list, periodic
validation through the jitted pipeline (PSNR/SSIM logged like
log_validation, reference :91-294), and wandb/tensorboard/jsonl trackers.

conditioning_channels follows the reference exactly (:968-979):
5 + {concat:1, latents:4}(depth) + {concat:3, latents:4}(normals).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def conditioning_channels_for(depth_mode: Optional[str], normals_mode: Optional[str]) -> int:
    ch = 5
    ch += {"concat": 1, "latents": 4, None: 0}[depth_mode]
    ch += {"concat": 3, "latents": 4, "ip_adapter": 0, None: 0}[normals_mode]
    return ch


class JsonlTracker:
    """Always-on fallback tracker: one json line per logged step."""

    def __init__(self, logging_dir: str):
        os.makedirs(logging_dir, exist_ok=True)
        self.f = open(os.path.join(logging_dir, "metrics.jsonl"), "a")

    def log(self, values: dict, step: int):
        self.f.write(json.dumps({"step": step, **values}) + "\n")
        self.f.flush()


def make_trackers(args):
    trackers = [JsonlTracker(args.logging_dir)]
    if args.report_to in ("wandb", "all"):
        try:
            import wandb

            wandb.init(project=args.tracker_project_name, config=vars(args))
            trackers.append(wandb)
        except Exception as e:  # pragma: no cover
            logger.warning("wandb unavailable (%s); falling back to jsonl", e)
    return trackers


def log_to_trackers(trackers, values: dict, step: int):
    for t in trackers:
        try:
            t.log(values, step=step) if hasattr(t, "log") else None
        except TypeError:
            t.log(values, step)


def load_models(args, dtype):
    """SD-1.5 components + BrushNet twin with from_unet surgery."""
    import jax.numpy as jnp

    from reflecting_reality_tpu.core.io import load_pretrained, load_safetensors, torch_to_flax_params
    from reflecting_reality_tpu.data.tokenizer import CLIPTokenizer, HashTokenizer
    from reflecting_reality_tpu.models.brushnet import BrushNetModel, init_params_from_unet
    from reflecting_reality_tpu.models.clip_text import CLIPTextModel
    from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
    from reflecting_reality_tpu.models.vae import AutoencoderKL
    import jax

    base = args.pretrained_model_name_or_path
    cond_ch = conditioning_channels_for(
        args.depth_conditioning_mode, args.normals_conditioning_mode
    )

    ip_mode = args.normals_conditioning_mode == "ip_adapter"
    unet_overrides = {}
    if ip_mode:
        from reflecting_reality_tpu.models.ip_adapter import DEFAULT_NUM_TOKENS

        unet_overrides = dict(ip_num_tokens=DEFAULT_NUM_TOKENS,
                              ip_scale=args.ip_adapter_scale)
    unet_module, unet_params = load_pretrained(
        UNet2DConditionModel, base, subfolder="unet", dtype=dtype,
        # base SD checkpoints lack the decoupled ip projections; they are
        # grafted from to_k/to_v just below
        allow_missing=("to_k_ip", "to_v_ip") if ip_mode else (),
        **unet_overrides
    )
    if ip_mode:
        # graft to_k_ip/to_v_ip (initialized from to_k/to_v) into the loaded tree
        from reflecting_reality_tpu.models.ip_adapter import init_ip_params_from_unet

        sample = np.zeros((1, 8, 8, 4), np.float32)
        t0 = np.zeros((1,), np.int32)
        ehs0 = np.zeros((1, 77 + 1, unet_module.cross_attention_dim), np.float32)
        # init on host CPU: the values are grafted/device_get immediately, and
        # a full-scale init compile on the remote TPU helper costs minutes
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            fresh = jax.jit(unet_module.init)(jax.random.PRNGKey(0), sample, t0, ehs0)
        unet_params = {"params": init_ip_params_from_unet(
            jax.device_get(fresh)["params"], unet_params["params"]
        )}
    vae = load_pretrained(AutoencoderKL, base, subfolder="vae", dtype=dtype)

    from reflecting_reality_tpu.models.clip_text import load_text_encoder

    text = load_text_encoder(base, dtype=dtype)
    tokenizer = CLIPTokenizer.from_pretrained(base, subfolder="tokenizer")

    if args.brushnet_model_name_or_path:
        brushnet_module, brushnet_params = load_pretrained(
            BrushNetModel, args.brushnet_model_name_or_path, dtype=dtype
        )
    else:
        # from_unet: conv-only twin + weight surgery (reference brushnet.py:452-530)
        cfg = BrushNetModel.config_from_unet(unet_module, conditioning_channels=cond_ch)
        brushnet_module = BrushNetModel.from_config(cfg, dtype=dtype)
        sample = np.zeros((1, 8, 8, 4), np.float32)
        t = np.zeros((1,), np.int32)
        ehs = np.zeros((1, 77, unet_module.cross_attention_dim), np.float32)
        cond = np.zeros((1, 8, 8, cond_ch), np.float32)
        # init on host CPU (values feed straight into the host-side surgery;
        # a TPU-side init is a wasted remote compile + transfer)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            brushnet_params = jax.jit(brushnet_module.init)(
                jax.random.PRNGKey(args.seed or 0), sample, t, ehs, cond
            )
        brushnet_params = {
            "params": init_params_from_unet(
                jax.device_get(brushnet_params)["params"], unet_params["params"]
            )
        }
    normal_proj = None
    if ip_mode:
        from reflecting_reality_tpu.models.ip_adapter import NormalProjModel, NORMALS_EMBED_DIM

        proj = NormalProjModel(unet_module.cross_attention_dim, dtype=dtype)
        normal_proj = (proj, proj.init(jax.random.PRNGKey(1),
                                       np.zeros((1, 1, NORMALS_EMBED_DIM), np.float32)))
    return ((unet_module, unet_params), brushnet_module, brushnet_params,
            vae, text, tokenizer, normal_proj)


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    try:
        # live traceback on demand (`kill -USR1 <pid>`): long remote-TPU
        # phases are otherwise indistinguishable from a wedge
        import faulthandler
        import signal as _signal

        faulthandler.register(_signal.SIGUSR1)
    except (ImportError, AttributeError, ValueError):
        pass

    from reflecting_reality_tpu.core.jit_cache import enable_compilation_cache

    enable_compilation_cache(args.compilation_cache_dir)

    from reflecting_reality_tpu.ops.attention import set_attention_backend

    # Flash by default: the Pallas kernel is 2.7x XLA at the 4096-token
    # self-attention this model trains on (and the backend switch still
    # routes short/wide shapes to XLA, ops/attention.py crossover table).
    # Round-5 postmortem: the CLIs never set this while every benchmark
    # did — the cached-E2E train ran einsum attention at 2.56 steps/s vs
    # the 3.68 anchor (benchmarks/analyze_train_trace.py caught the
    # HBM-bound 4096² logits fusions).
    set_attention_backend(args.attention_backend)

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from reflecting_reality_tpu.data.loader import DataLoader, prefetch_to_device
    from reflecting_reality_tpu.data.synmirror import HDF5Dataset, MSDDataset
    from reflecting_reality_tpu.parallel.mesh import make_mesh, replicate_tree
    from reflecting_reality_tpu.training import checkpoint as ckpt
    from reflecting_reality_tpu.training.train_step import TrainConfig, make_train_step

    dtype = {"no": jnp.float32, "fp16": jnp.float32, "bf16": jnp.bfloat16}[
        args.mixed_precision
    ]
    # bf16 input transport: the train step consumes every float input via
    # .astype(bf16) under --mixed_precision bf16, so casting on the host
    # before upload is bit-identical and halves host->device input bytes
    # (pinned by tests/test_training.py::TestBF16Transport).
    transport_dtype = None
    if args.input_transport_dtype == "bf16" or (
            args.input_transport_dtype == "auto"
            and args.mixed_precision == "bf16"):
        transport_dtype = jnp.bfloat16
    # ip_adapter mode consumes batch['normals'] at fp32 (train_step.py
    # freq_encode with bands to 2^5) — exempt it from the host-side cast or
    # the 'bit-identical transport' invariant would silently break.
    transport_exempt = (
        ("normals",) if args.normals_conditioning_mode == "ip_adapter" else ())

    t_load = time.time()
    logger.info("Loading models from %s ...", args.pretrained_model_name_or_path)
    (unet_module, unet_params), brushnet_module, brushnet_params, vae, text, tokenizer, normal_proj = (
        load_models(args, dtype)
    )
    logger.info("Models loaded in %.1fs", time.time() - t_load)

    # dataset
    df = pd.read_csv(os.path.join(args.train_data_dir, args.train_csv))
    if args.max_train_samples:
        df = df.iloc[: args.max_train_samples]
    if args.precomputed_latents_dir:
        # moments cache (tools/precompute_latents.py): skips the per-step VAE
        # encodes; sampling from the cached DiagonalGaussian stays stochastic
        from reflecting_reality_tpu.data.latent_cache import LatentCachedDataset

        if args.random_flip:
            raise SystemExit(
                "--precomputed_latents_dir caches one deterministic variant; "
                "drop --random_flip or retrain without the cache"
            )
        dataset = LatentCachedDataset(
            args.precomputed_latents_dir, df, tokenizer,
            proportion_empty_prompts=args.proportion_empty_prompts,
            mirror_prompt=args.mirror_prompt,
            caption_column=args.caption_column,
            seed=args.seed,
        )
        if args.device_cache:
            # device-resident dataset (train_step.resolve_device_cache):
            # ship the whole moments cache to the accelerator once; the
            # per-step host->device path shrinks to index + input_ids
            from reflecting_reality_tpu.data.latent_cache import (
                DeviceCacheIndexDataset, materialize_cache)

            max_gb = float(os.environ.get("RR_DEVICE_CACHE_MAX_GB", 4.0))
            host_cache = materialize_cache(
                dataset, transport_dtype=transport_dtype,
                max_bytes=int(max_gb * 1e9),
                transport_exempt=transport_exempt)
            dataset = DeviceCacheIndexDataset(dataset)
            logger.info(
                "Device cache: %d samples, %.2f GB resident",
                len(dataset),
                sum(v.nbytes for v in host_cache.values()) / 1e9)
    elif args.device_cache:
        raise SystemExit("--device_cache requires --precomputed_latents_dir")
    else:
        ds_cls = {"synmirror": HDF5Dataset, "msd": MSDDataset}[args.dataset_type]
        dataset = ds_cls(
            args.train_data_dir, df, tokenizer,
            resolution=args.resolution,
            proportion_empty_prompts=args.proportion_empty_prompts,
            mirror_prompt=args.mirror_prompt,
            caption_column=args.caption_column,
            random_flip=args.random_flip,
            seed=args.seed,
            depth=args.depth_conditioning_mode is not None,
            normals_conditioning_mode=args.normals_conditioning_mode or False,
            hint_map_dir=args.hint_map_dir,
            cam_states=args.cam_states,
        )

    mesh = make_mesh()
    n_dev = len(mesh.devices.flatten())
    global_batch = args.train_batch_size * n_dev
    # Multi-host: every process reads only its slice of each global batch
    # (one-loader-per-rank semantics, reference :1242-1269); shard_batch in
    # prefetch_to_device reassembles the slices into global arrays.
    loader = DataLoader(dataset, global_batch, shuffle=True,
                        num_workers=args.dataloader_num_workers or 8, seed=args.seed or 0,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())

    config = TrainConfig(
        learning_rate=args.learning_rate,
        scale_lr=args.scale_lr,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        lr_num_cycles=args.lr_num_cycles,
        lr_power=args.lr_power,
        max_train_steps=args.max_train_steps,
        adam_weight_decay=args.adam_weight_decay,
        adam_epsilon=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm,
        snr_gamma=args.snr_gamma,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        gradient_checkpointing=args.gradient_checkpointing,
        gradient_checkpointing_policy=args.gradient_checkpointing_policy,
        train_base_unet=args.train_base_unet,
        use_ema=args.use_ema,
        ema_dtype=args.ema_dtype,
        depth_conditioning_mode=args.depth_conditioning_mode,
        normals_conditioning_mode=args.normals_conditioning_mode,
    )
    step_fn, init_state = make_train_step(
        unet_module, brushnet_module, vae[0], text[0], config, dtype=dtype
    )
    if args.mixed_precision == "bf16":
        # reference mixed-precision policy (train_brushnet_mirror.py:1125-1167):
        # FROZEN modules are stored in half precision, trainables stay fp32
        # master weights.  At SD-1.5 scale this frees ~2.5 GB of HBM (frozen
        # unet 1.7 + vae 0.17 + text 0.25), the margin between bs=2 and bs=4
        # per chip.  (In ip_adapter partial-freeze mode the unet lives in the
        # trainable dict and stays fp32.)
        from reflecting_reality_tpu.core.io import cast_floating

        vae = (vae[0], cast_floating(vae[1], jnp.bfloat16))
        text = (text[0], cast_floating(text[1], jnp.bfloat16))
        if not args.train_base_unet and not normal_proj:
            unet_params = cast_floating(unet_params, jnp.bfloat16)
    # Build the train state ON HOST: init_state runs eagerly (optimizer
    # moment zeros, EMA copies) over thousands of leaves, and each eager op
    # on a remote TPU backend is a full dispatch round-trip (~seconds on a
    # relayed chip — the process looks wedged).  On host CPU it is
    # milliseconds; the single replicate_tree below then uploads the whole
    # tree as plain transfers (no per-op dispatches).
    resume_path = None
    if args.resume_from_checkpoint:
        resume_path = (ckpt.latest_checkpoint(args.output_dir)
                       if args.resume_from_checkpoint == "latest"
                       else args.resume_from_checkpoint)

    t_up = time.time()
    if resume_path:
        # Resume: checkpoint opt_state/EMA are real data — build the host
        # template, overwrite from disk, upload everything.
        logger.info("Initializing train state (host) ...")
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            state = init_state(brushnet_params, unet_params, vae[1], text[1],
                               normal_proj_params=normal_proj[1] if normal_proj else None)
        logger.info("Resuming from %s", resume_path)
        state = ckpt.load_state(resume_path, state)
        logger.info("Uploading train state to the mesh ...")
        state = replicate_tree(state, mesh)
    else:
        # Fresh start: upload only the param trees and construct
        # opt_state/EMA on DEVICE with one jitted init — fresh Adam moments
        # are zeros and the EMA is a cast copy of the params, so uploading
        # them (~4.5 GB at SD-1.5 scale) would be pure transfer waste.  One
        # jit keeps it a single dispatch (eager per-leaf init on a relayed
        # backend is thousands of round-trips).
        logger.info("Uploading params; initializing opt/EMA state on device ...")
        up = replicate_tree(
            {"brushnet": brushnet_params, "unet": unet_params,
             "vae": vae[1], "text": text[1],
             "normal_proj": normal_proj[1] if normal_proj else None},
            mesh)
        # donate the uploaded params: without it the jit COPIES every param
        # into fresh output buffers and the tree is resident twice (~+4 GB
        # at SD-1.5 scale — an instant OOM next to the optimizer state).
        state = jax.jit(
            lambda p: init_state(p["brushnet"], p["unet"], p["vae"],
                                 p["text"], normal_proj_params=p["normal_proj"]),
            donate_argnums=(0,),
        )(up)
        del up
    jax.block_until_ready(state)
    logger.info("State resident in %.1fs", time.time() - t_up)

    device_cache = None
    if args.device_cache:
        # one-time upload of the whole sample cache; per-step inputs are
        # then index + input_ids only (train_step.resolve_device_cache)
        device_cache = replicate_tree(host_cache, mesh)
        jax.block_until_ready(device_cache)
        del host_cache

    from reflecting_reality_tpu.training.train_step import resolve_device_cache

    base_step = step_fn

    def raw_step(state, batch, rng):
        if "index" in batch:  # device-cache mode: batch carries the cache
            batch = resolve_device_cache(
                {"index": batch["index"], "input_ids": batch["input_ids"]},
                batch["cache"])
        return base_step(state, batch, rng)

    step_fn = jax.jit(raw_step, donate_argnums=(0,))

    # --steps_per_dispatch K > 1: scan K steps per dispatch over a stacked
    # (K, batch, ...) super-batch — one host->device upload and one XLA
    # dispatch per K steps, so host/dispatch latency amortizes K-fold (the
    # TPU-native answer to per-step Python loop overhead).  The scan body
    # splits the carried rng exactly like the host loop below, so the
    # RNG/step stream is the same as K=1; numerics match K=1 to
    # floating-point tolerance (the scan compiles a different XLA program,
    # so fusion differences produce ulp-level drift, not exact bits).
    multi_cache: dict = {}

    def multi_step_fn(k):
        if k not in multi_cache:
            def multi(state, batches, rng, cache):
                # `cache` (device-resident dataset, or None) rides outside
                # the scanned xs — every step gathers its rows by index
                def body(carry, batch):
                    state, rng = carry
                    rng, sub = jax.random.split(rng)
                    if cache is not None:
                        batch = dict(batch, cache=cache)
                    state, metrics = raw_step(state, batch, sub)
                    return (state, rng), metrics
                (state, rng), metrics = jax.lax.scan(body, (state, rng), batches)
                return state, metrics, rng
            multi_cache[k] = jax.jit(multi, donate_argnums=(0,))
        return multi_cache[k]

    trackers = make_trackers(args)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)

    custom_steps = set(args.custom_checkpoints or [])
    async_saver = ckpt.AsyncCheckpointer() if args.async_save else None
    nan_steps = 0
    rng = jax.random.PRNGKey(args.seed or 0)
    step = first_step = int(jax.device_get(state.step))
    t0 = time.time()
    logger.info("Training: %d devices, global batch %d, start step %d",
                n_dev, global_batch, step)

    if len(loader) == 0:
        raise ValueError(
            f"dataset ({len(dataset)} samples) smaller than the global batch "
            f"({global_batch} = {args.train_batch_size} x {n_dev} devices)"
        )
    K = max(1, args.steps_per_dispatch)
    # Serialized dispatch: complete each K-step dispatch before submitting
    # the next.  Overlapped dispatch was measured FREE on this backend
    # (benchmarks/exp_train_gap.py dispatch_deferred == dispatch_seq ==
    # 3.68 steps/s), so "auto" keeps the overlap; the knob remains as a
    # diagnostic for transports where queued executions might interact
    # (it was how the round-5 einsum-attention regression was bisected).
    serialize = args.serialize_dispatch == "on"
    if serialize:
        logger.info("Serialized dispatch enabled (K=%d)", K)
    for name, cadence in (("checkpointing_steps", args.checkpointing_steps),
                          ("validation_steps", args.validation_steps),
                          ("log_every", args.log_every)):
        if cadence and K > cadence:
            logger.warning(
                "steps_per_dispatch=%d exceeds %s=%d: multiple scheduled "
                "events inside one dispatch collapse into one, so the "
                "effective cadence is once per %d-step dispatch",
                K, name, cadence, K)
    last_fetch_step = first_step
    pending_metrics = None  # (prev, step, metrics) of the last dispatch

    def drain_metrics(pend_prev, pend_step, metrics):
        """Fetch + log a dispatch's metric stack.

        Called AFTER the next dispatch has been submitted (one-dispatch
        deferral): the blocking device_get's completion+round-trip then
        overlaps the next dispatch's device compute instead of serializing
        with it — on a relayed chip that round trip is 1-3 s per dispatch.
        Cost: the non-finite-loss abort fires one dispatch later (one extra
        dispatch of wasted compute on a poisoned run)."""
        nonlocal t0, last_fetch_step, nan_steps
        logged = [s for s in range(pend_prev + 1, pend_step + 1)
                  if s % args.log_every == 0]
        if not logged:
            return
        m = jax.device_get(metrics)
        losses = np.asarray(m["loss"]).reshape(-1)
        gnorms = np.asarray(m["grad_norm"]).reshape(-1)
        sps = (pend_step - last_fetch_step) / (time.time() - t0)
        t0 = time.time()
        last_fetch_step = pend_step
        for s in logged:
            i = min(s - pend_prev - 1, len(losses) - 1)
            log_to_trackers(trackers, {
                "loss": float(losses[i]),
                "grad_norm": float(gnorms[i]),
                "steps_per_sec": round(sps, 3),
            }, s)
            # Failure detection the reference lacks: a non-finite loss
            # poisons AdamW state from that step on; stop with a clear
            # message (and a usable last checkpoint) instead of training
            # to max_steps on NaN weights.
            if not np.isfinite(losses[i]):
                nan_steps += 1
                logger.error("non-finite loss %s at step %d (%d/%d)",
                             losses[i], s, nan_steps,
                             args.max_nonfinite_steps)
                if nan_steps >= args.max_nonfinite_steps:
                    ckpt.save_state(args.output_dir, step, state,
                                    brushnet_module, unet_module,
                                    total_limit=None, keep=custom_steps)
                    raise FloatingPointError(
                        f"loss non-finite for {nan_steps} consecutive "
                        f"logged steps; aborting at step {step}")
            else:
                nan_steps = 0

    def epochs():
        # one continuous batch stream across epochs: per-epoch shuffling and
        # item-RNG epoch advance happen inside loader.__iter__, but K-step
        # super-batches never hit an epoch-tail partial group (a partial
        # dispatch compiles a second program and halves the dispatch
        # amortization on small datasets where K > batches-per-epoch).
        # Bounded at exactly the batches the loop will consume, so the
        # prefetch producer thread drains and exits with the loop instead of
        # loading/uploading super-batches nobody reads while the final state
        # fetch and checkpoint write compete for transport bandwidth.
        remaining = args.max_train_steps - first_step
        while remaining > 0:
            for b in iter(loader):
                yield b
                remaining -= 1
                if remaining <= 0:
                    return

    # RR_LOOP_TIMING=1: log per-dispatch phase durations (batch-wait /
    # submit / metric-drain / events) to attribute loop overhead on remote
    # transports; off by default (one wall-clock read per phase otherwise).
    loop_timing = bool(os.environ.get("RR_LOOP_TIMING"))
    # RR_TRACE_DISPATCH_STEP=N (+ RR_TRACE_DIR): capture a jax.profiler
    # device trace of the single dispatch containing step N (submit ->
    # completion barrier), to attribute dispatch time on remote transports.
    trace_step = int(os.environ.get("RR_TRACE_DISPATCH_STEP", "0"))
    trace_dir = os.environ.get("RR_TRACE_DIR", "/tmp/rr_train_trace")
    t_loop = time.time()
    while step < args.max_train_steps:
        for batch in prefetch_to_device(epochs(), mesh, group=K,
                                        transport_dtype=transport_dtype,
                                        transport_exempt=transport_exempt):
            t_batch = time.time()
            tracing = trace_step and step < trace_step <= step + K
            if tracing:
                logger.info("Tracing dispatch at step %d -> %s", step,
                            trace_dir)
                _trace_cm = jax.profiler.trace(trace_dir)
                _trace_cm.__enter__()
            if step == first_step:
                logger.info("Compiling train step (first dispatch) ...")
            if K == 1:
                rng, step_rng = jax.random.split(rng)
                if device_cache is not None:
                    batch = dict(batch, cache=device_cache)
                state, metrics = step_fn(state, batch, step_rng)
                done = 1
            else:
                k = jax.tree_util.tree_leaves(batch)[0].shape[0]
                k = min(k, args.max_train_steps - step)  # never overshoot
                if k < jax.tree_util.tree_leaves(batch)[0].shape[0]:
                    batch = jax.tree_util.tree_map(lambda x: x[:k], batch)
                state, metrics, rng = multi_step_fn(k)(
                    state, batch, rng, device_cache)
                done = k
            prev, step = step, step + done
            window = range(prev + 1, step + 1)
            t_submit = time.time()
            if serialize or tracing:
                # barrier: fetch the scalar step so this dispatch fully
                # completes before the next one is enqueued (see the
                # serialize_dispatch comment above; block_until_ready
                # under-waits through the relay, a value fetch does not)
                np.asarray(state.step)
            if tracing:
                _trace_cm.__exit__(None, None, None)
                logger.info("Trace written to %s", trace_dir)
            t_barrier = time.time()

            # this dispatch is submitted (async); NOW drain the previous
            # one's metrics so the fetch overlaps this dispatch's compute
            if pending_metrics is not None:
                drain_metrics(*pending_metrics)
                pending_metrics = None
            if any(s % args.log_every == 0 for s in window):
                pending_metrics = (prev, step, metrics)
            if loop_timing:
                t_drain = time.time()
                logger.info(
                    "loop timing step %d: batch_wait=%.2fs submit=%.2fs "
                    "barrier=%.2fs drain=%.2fs events=%.2fs",
                    step, t_batch - t_loop, t_submit - t_batch,
                    t_barrier - t_submit, t_drain - t_barrier, 0.0)
                t_loop = t_drain
            else:
                t_loop = time.time()

            rounded_custom = custom_steps.intersection(window) - {step}
            if any(s % args.checkpointing_steps == 0 for s in window) \
                    or custom_steps.intersection(window):
                # with K > 1 the save lands on the dispatch boundary (step
                # rounds up to the next multiple of K past the configured
                # cadence); resume reads state.step so nothing is lost.  A
                # custom step rounded to this boundary must keep its pin
                # protection, so the boundary step joins the keep set.
                keep = custom_steps | ({step} if rounded_custom else set())
                if rounded_custom:
                    logger.warning(
                        "custom checkpoint step(s) %s rounded to dispatch "
                        "boundary %d (steps_per_dispatch=%d); checkpoint-%d "
                        "is pinned in their place",
                        sorted(rounded_custom), step, K, step)
                if async_saver is not None:
                    async_saver.save(
                        args.output_dir, step, state, brushnet_module,
                        unet_module,
                        total_limit=args.checkpoints_total_limit,
                        keep=keep,
                    )
                    logger.info("Saving checkpoint-%d in background", step)
                else:
                    path = ckpt.save_state(
                        args.output_dir, step, state, brushnet_module, unet_module,
                        total_limit=args.checkpoints_total_limit, keep=keep,
                    )
                    logger.info("Saved %s", path)

            if args.validation_steps and any(
                    s % args.validation_steps == 0 for s in window):
                # No blanket try/except here: a broken validation path must
                # fail loudly. Per-sample IO errors are handled inside
                # run_validation.
                run_validation(args, state, unet_module, brushnet_module,
                               vae, text, tokenizer, trackers, step, dtype)

            if step >= args.max_train_steps:
                break

    if pending_metrics is not None:
        drain_metrics(*pending_metrics)
        pending_metrics = None
    if async_saver is not None:
        async_saver.wait()  # surface any background write error before exit
    ckpt.save_state(args.output_dir, step, state, brushnet_module, unet_module,
                    total_limit=None, keep=custom_steps)
    logger.info("Done at step %d", step)


def run_validation(args, state, unet_module, brushnet_module, vae, text,
                   tokenizer, trackers, step, dtype):
    """log_validation (reference :91-294): sample validation rows, run the
    live pipeline at 20 UniPC steps x num_images_per_validation seeds, log
    best-of-seed PSNR/SSIM + image grids."""
    import h5py
    import jax
    import pandas as pd
    from PIL import Image

    from reflecting_reality_tpu.data.synmirror import (
        apply_transforms_depth, apply_transforms_normals, extract_data_from_hdf5,
        normals_to_uint8,
    )
    from reflecting_reality_tpu.metrics.functional import psnr_ssim
    from reflecting_reality_tpu.pipelines.brushnet_pipeline import StableDiffusionBrushNetPipeline

    from reflecting_reality_tpu.parallel.mesh import fetch_tree

    host = fetch_tree(state)  # bounded-in-flight download (relay-safe)
    unet_params = host.trainable.get("unet", host.frozen.get("unet"))
    normal_proj = None
    if args.normals_conditioning_mode == "ip_adapter":
        from reflecting_reality_tpu.models.ip_adapter import NormalProjModel

        normal_proj = (
            NormalProjModel(unet_module.cross_attention_dim, dtype=dtype),
            host.trainable["normal_proj"],
        )
    pipe = StableDiffusionBrushNetPipeline(
        vae=(vae[0], host.frozen["vae"]),
        text_encoder=(text[0], host.frozen["text"]),
        tokenizer=tokenizer,
        unet=(unet_module, unet_params),
        brushnet=(brushnet_module, host.trainable["brushnet"]),
        depth_conditioning_mode=args.depth_conditioning_mode,
        normals_conditioning_mode=args.normals_conditioning_mode,
        normal_proj=normal_proj,
        dtype=dtype,
    )
    df = pd.read_csv(os.path.join(args.train_data_dir, args.test_csv))
    if args.validation_csv_indices:
        df = df.iloc[args.validation_csv_indices]
    else:
        df = df.iloc[: args.num_validation_images]

    summarize = None
    if args.summarizer:
        # validation-prompt summarization (reference :948-951,213-214)
        from reflecting_reality_tpu.tools.summarize_captions import summarize_fn

        summarize = summarize_fn(args.summarizer)

    # validation-time LPIPS (reference log_validation logs PSNR/SSIM/LPIPS,
    # train_brushnet_mirror.py:238 via metrics/metrics.py:51-67); computed
    # only when an --lpips_weights file is supplied, like metrics/evaluate.py
    lpips_calc = None
    if args.lpips_weights:
        from reflecting_reality_tpu.metrics.calculator import MetricsCalculator

        lpips_calc = MetricsCalculator([], lpips_weights=args.lpips_weights)

    def stamp(img_arr, psnr, ssim, lpips=None):
        """Annotate scores onto the image (reference :239-242)."""
        from PIL import ImageDraw

        im = Image.fromarray(img_arr)
        draw = ImageDraw.Draw(im)
        draw.rectangle([0, 0, im.width, 12], fill=(0, 0, 0))
        text = f"PSNR {psnr:.2f}  SSIM {ssim:.3f}"
        if lpips is not None:
            text += f"  LPIPS {lpips:.3f}"
        draw.text((2, 1), text, fill=(255, 255, 0))
        return im

    val_dir = os.path.join(args.output_dir, "validation", f"step-{step}")
    os.makedirs(val_dir, exist_ok=True)
    best_psnrs, best_ssims, best_lpips = [], [], []
    for _, row in df.iterrows():
        try:
            with h5py.File(os.path.join(args.train_data_dir, str(row["path"])), "r") as f:
                data = extract_data_from_hdf5(f)
        except (OSError, KeyError) as e:
            # per-sample IO tolerance only (reference log_validation reads
            # samples unguarded; eval-side per-sample try/except is the
            # reference pattern, evaluate_metrics.py:365-369)
            logger.warning("validation sample %s unreadable: %s", row.get("path"), e)
            continue
        depth = None
        if args.depth_conditioning_mode is not None:
            depth = apply_transforms_depth(data["depth"], data["mask"],
                                           resolution=args.resolution)
        normals = None
        if args.normals_conditioning_mode in ("concat", "latents"):
            # raw normals image; the pipeline preprocesses it (reference
            # get_hdf5_data :131-132)
            normals = Image.fromarray(normals_to_uint8(data["normals"]), mode="RGB")
        elif args.normals_conditioning_mode == "ip_adapter":
            normals = apply_transforms_normals(
                data["normals"], mask=data["mask"],
                normals_conditioning_mode="ip_adapter",
            )  # (1, 3) unit mean mirror normal
        prompt = args.mirror_prompt + str(row[args.caption_column])
        if summarize is not None:
            prompt = summarize(prompt)
        scores = []
        for k in range(args.num_images_per_validation):
            out = pipe(
                prompt,
                Image.fromarray(data["masked_image"]),
                Image.fromarray(data["mask"]).convert("RGB"),
                depth=depth,
                normals=normals,
                height=args.resolution, width=args.resolution,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=7.5, seed=k,
                brushnet_conditioning_scale=args.brushnet_conditioning_scale,
            )[0]
            p, s = psnr_ssim(out.astype(np.float32),
                             data["image"].astype(np.float32))
            lp = None
            if lpips_calc is not None:
                lp = lpips_calc.calculate_lpips(
                    out.astype(np.float32) / 127.5 - 1.0,
                    data["image"].astype(np.float32) / 127.5 - 1.0)
            scores.append((p, s, lp, out))
        # 2-row grid sheet of score-stamped seeds (reference logs grids)
        stamped = [stamp(o, p, s, lp) for p, s, lp, o in scores]
        cols = max(1, len(stamped) // 2)
        w, h = stamped[0].size
        grid = Image.new("RGB", (cols * w, 2 * h))
        for k, im in enumerate(stamped):
            grid.paste(im, (k % cols * w, k // cols * h))
        grid.save(os.path.join(val_dir, f"{row['uid']}.png"))
        best = max(scores, key=lambda x: x[1])
        best_psnrs.append(best[0])
        best_ssims.append(best[1])
        if best[2] is not None:
            best_lpips.append(best[2])

    if not best_psnrs:
        logger.warning("validation produced no samples at step %d", step)
        return
    scalars = {
        "val/psnr": float(np.mean(best_psnrs)),
        "val/ssim": float(np.mean(best_ssims)),
    }
    if best_lpips:
        scalars["val/lpips"] = float(np.mean(best_lpips))
    log_to_trackers(trackers, scalars, step)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MirrorFusion training")
    # model
    p.add_argument("--pretrained_model_name_or_path", type=str, required=True)
    p.add_argument("--brushnet_model_name_or_path", type=str, default=None)
    p.add_argument("--revision", type=str, default=None)
    p.add_argument("--variant", type=str, default=None)
    p.add_argument("--tokenizer_name", type=str, default=None)
    p.add_argument("--summarizer", type=str, default=None,
                   help="summarization model for long validation prompts, "
                        "e.g. sshleifer/distilbart-cnn-6-6 (reference :395-398)")
    # io
    p.add_argument("--output_dir", type=str, default="runs/brushnet-model")
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--logging_dir", type=str, default="logs")
    p.add_argument("--report_to", type=str, default="wandb")
    p.add_argument("--tracker_project_name", type=str, default="train_brushnet_mirror")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="scan this many optimizer steps inside ONE jitted "
                        "dispatch over a stacked (K, batch, ...) super-batch; "
                        "amortizes host->device upload + dispatch latency "
                        "K-fold. Same RNG/step stream as K=1; numerics match "
                        "to floating-point tolerance. Checkpoints/validation "
                        "land on dispatch boundaries, so effective cadence is "
                        "max(cadence, K). Prefetched super-batches pin ~2*K "
                        "batches of input data in HBM")
    p.add_argument("--attention_backend", type=str, default="flash",
                   choices=["flash", "xla"],
                   help="attention kernel: 'flash' (Pallas, 2.7x at 4096 "
                        "tokens; short/wide shapes still route to XLA) or "
                        "'xla' (einsum softmax attention everywhere)")
    p.add_argument("--serialize_dispatch", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="diagnostic: complete each dispatch before "
                        "submitting the next (isolates per-dispatch device "
                        "time in loop timing). Overlapped dispatch is "
                        "measured free on TPU, so auto == off")
    p.add_argument("--input_transport_dtype", type=str, default="auto",
                   choices=["auto", "fp32", "bf16"],
                   help="host->device dtype for float input batches. 'auto' "
                        "= bf16 when --mixed_precision bf16 (bit-identical: "
                        "the step casts every float input to bf16 anyway), "
                        "halving input upload bytes; 'fp32' forces full-"
                        "precision transport")
    p.add_argument("--precomputed_latents_dir", type=str, default=None,
                   help="VAE-moments cache from tools/precompute_latents.py; "
                        "training samples from cached moments instead of "
                        "encoding pixels every step")
    p.add_argument("--device_cache", action="store_true",
                   help="with --precomputed_latents_dir: upload the ENTIRE "
                        "moments cache to the accelerator once and gather "
                        "batches by index on device — per-step host->device "
                        "input shrinks to index+input_ids (~KB). Needs the "
                        "cache to fit in HBM next to the train state "
                        "(~150 KB/sample at 512²; cap RR_DEVICE_CACHE_MAX_GB, "
                        "default 4)")
    p.add_argument("--max_nonfinite_steps", type=int, default=3,
                   help="abort (after a final checkpoint) once the loss is "
                        "non-finite for this many consecutive logged steps")
    # training
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--compilation_cache_dir", type=str, default=None,
                   help="persistent XLA compilation cache directory")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--train_batch_size", type=int, default=4)
    p.add_argument("--num_train_epochs", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=20000)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--async_save", action="store_true",
                   help="write periodic checkpoints from a background thread "
                        "(device->host DMA enqueued async); the final "
                        "checkpoint still saves synchronously")
    p.add_argument("--custom_checkpoints", type=int, nargs="+", default=None)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--gradient_checkpointing_policy", type=str, default="full",
                   choices=["full", "dots"],
                   help="full = recompute whole branch forwards (reference "
                        "semantics); dots = save matmul outputs, recompute "
                        "the rest (faster, slightly more memory)")
    p.add_argument("--learning_rate", type=float, default=5e-6)
    p.add_argument("--scale_lr", action="store_true")
    p.add_argument("--lr_scheduler", type=str, default="constant")
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--lr_num_cycles", type=int, default=1)
    p.add_argument("--lr_power", type=float, default=1.0)
    p.add_argument("--dataloader_num_workers", type=int, default=0)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-08)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--snr_gamma", type=float, default=None)
    p.add_argument("--mixed_precision", type=str, default="no",
                   choices=["no", "fp16", "bf16"])
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--ema_dtype", type=str, default="fp32",
                   choices=["fp32", "bf16"],
                   help="EMA shadow-weight storage; bf16 halves the copy "
                        "(fits bs=4+EMA on a 16 GB v5e)")
    p.add_argument("--set_grads_to_none", action="store_true",
                   help="accepted for reference-CLI compatibility; a no-op "
                        "here (optax has no grad buffers to zero)")
    p.add_argument("--enable_xformers_memory_efficient_attention", action="store_true",
                   help="accepted for reference-CLI compatibility; a no-op "
                        "here (attention backend is XLA/Pallas, see "
                        "ops.attention.set_attention_backend)")
    # data
    p.add_argument("--dataset_name", type=str, default=None)
    p.add_argument("--dataset_config_name", type=str, default=None)
    p.add_argument("--train_data_dir", type=str, required=True)
    p.add_argument("--dataset_type", type=str, default="synmirror",
                   choices=["synmirror", "msd"])
    p.add_argument("--train_csv", type=str, default="train.csv")
    p.add_argument("--test_csv", type=str, default="test.csv")
    p.add_argument("--caption_column", type=str, default="auto_caption")
    p.add_argument("--mirror_prompt", type=str,
                   default="A perfect plane mirror reflection of ")
    p.add_argument("--image_column", type=str, default="image")
    p.add_argument("--conditioning_image_column", type=str, default="conditioning_image")
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--proportion_empty_prompts", type=float, default=0.2)
    p.add_argument("--random_flip", action="store_true")
    p.add_argument("--hint_map_dir", type=str, default=None)
    p.add_argument("--cam_states", action="store_true")
    # conditioning
    p.add_argument("--depth_conditioning_mode", type=str, default=None,
                   choices=[None, "concat", "latents"])
    p.add_argument("--normals_conditioning_mode", type=str, default=None,
                   choices=[None, "concat", "latents", "ip_adapter"])
    p.add_argument("--ip_adapter_scale", type=float, default=1.0)
    p.add_argument("--train_base_unet", action="store_true")
    # validation
    p.add_argument("--num_validation_images", type=int, default=4)
    p.add_argument("--validation_csv_indices", type=int, nargs="+", default=None)
    p.add_argument("--num_images_per_validation", type=int, default=4)
    p.add_argument("--brushnet_conditioning_scale", type=float, default=1.0)
    p.add_argument("--num_inference_steps", type=int, default=20)
    p.add_argument("--validation_steps", type=int, default=1000)
    p.add_argument("--lpips_weights", type=str, default=None,
                   help="LPIPS(squeeze) weights (.npz from tools/"
                        "convert_lpips.py or a torch checkpoint); when given, "
                        "validation logs val/lpips alongside PSNR/SSIM "
                        "(reference train_brushnet_mirror.py:238)")
    return p


if __name__ == "__main__":
    main()
