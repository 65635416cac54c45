"""Close the cached-E2E vs benchmark-anchor gap by isolation (VERDICT r4 item 3).

The cached E2E run executes 100-step dispatches at 2.56 steps/s steady state
(RR_LOOP_TIMING: batch_wait=0, submit=0.02s, drain=39.1s per 100 steps) while
the matched-config anchor row `train_step_512_bs4_ema_remat_cached` claims
3.68.  The loop adds NOTHING — so either the anchor program is flattering, or
the E2E's multi-step program is slower.  Differences between the two
programs, isolated here one at a time:

  fori_const  — the anchor replica: fori_loop over a CONSTANT closed-over
                batch, metrics discarded.  XLA hoists every loop-invariant
                computation (text encode, cond-latent prep) out of the loop
                and DCEs the metrics' extra work.
  scan_xs     — cli/train's multi(): lax.scan over a stacked (K,b,...)
                super-batch of DISTINCT per-step batches, metrics stacked
                and returned, rng split chain.
  scan_cache  — scan over {index, input_ids} + device-resident sample cache
                gather (the --device_cache E2E program, r5 launcher).

plus `dispatch_seq`: three timed consecutive dispatches of scan_cache with
donated state — detects cross-dispatch slowdowns (layout-variant recompile
at call 2, relay sync) that a single chained measurement hides.

Usage: python benchmarks/exp_train_gap.py [--batch 4] [--k 10,50]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache

enable_default_compilation_cache()

import jax
import jax.numpy as jnp

from reflecting_reality_tpu.models.brushnet import BrushNetModel
from reflecting_reality_tpu.models.clip_text import CLIPTextModel
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL
from reflecting_reality_tpu.ops.attention import set_attention_backend
from reflecting_reality_tpu.training.train_step import (
    TrainConfig,
    make_train_step,
    resolve_device_cache,
)


def build(b):
    set_attention_backend("flash")
    dtype = jnp.bfloat16
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
    bparams = jax.jit(brushnet.init)(r[1], sample, t0s, ehs,
                                     jnp.zeros((1, 64, 64, 6), dtype))
    vparams = jax.jit(vae.init)(r[2], jnp.zeros((1, 256, 256, 3), dtype),
                                jax.random.PRNGKey(9))
    tparams = jax.jit(text.init)(r[3], jnp.zeros((1, 77), jnp.int32))

    # EXACTLY the cached-E2E launcher config (train_tpu_cached.sh)
    config = TrainConfig(
        learning_rate=1e-4, lr_scheduler="constant", lr_warmup_steps=0,
        max_train_steps=400, snr_gamma=5.0, gradient_checkpointing=True,
        use_ema=True, ema_dtype="bf16", depth_conditioning_mode="concat",
    )
    step_fn, init_state = make_train_step(unet, brushnet, vae, text, config,
                                          dtype=dtype)
    from reflecting_reality_tpu.core.io import cast_floating

    uparams = cast_floating(uparams, jnp.bfloat16)
    vparams = cast_floating(vparams, jnp.bfloat16)
    tparams = cast_floating(tparams, jnp.bfloat16)
    state = init_state(bparams, uparams, vparams, tparams)
    return step_fn, state


def moments_batch(rs, b, hl=64, wl=64):
    return {
        "latent_moments": jnp.asarray(rs.randn(b, hl, wl, 8), jnp.float32),
        "cond_latent_moments": jnp.asarray(rs.randn(b, hl, wl, 8), jnp.float32),
        "masks": jnp.asarray((rs.rand(b, hl, wl, 1) > 0.5), jnp.float32),
        "depths": jnp.asarray(rs.randn(b, hl, wl, 1), jnp.float32),
        "input_ids": jnp.asarray(rs.randint(0, 49408, (b, 77)), jnp.int32),
    }


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def two_point(make_fn, state, k1, k2, label):
    """Chained two-point rate; returns (steps/s, state) carrying the donated
    state through so each variant starts from a valid resident state."""
    f1, a1 = make_fn(k1)
    f2, a2 = make_fn(k2)
    state = f1(state, *a1)  # compile k1
    sync(state)
    state = f2(state, *a2)  # compile k2
    sync(state)
    times = {}
    for k, f, a in ((k1, f1, a1), (k2, f2, a2)):
        t0 = time.time()
        state = f(state, *a)
        sync(state)
        times[k] = time.time() - t0
    sps = (k2 - k1) / (times[k2] - times[k1])
    print(f"{label:<12} {sps:6.2f} steps/s   "
          f"(t{k1}={times[k1]:.2f}s t{k2}={times[k2]:.2f}s)", flush=True)
    return sps, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", default="10,50")
    ap.add_argument("--variants", default="fori_const,scan_xs,scan_cache,dispatch_seq")
    args = ap.parse_args()
    b = args.batch
    k1, k2 = (int(x) for x in args.k.split(","))
    variants = args.variants.split(",")

    step_fn, state = build(b)
    rs = np.random.RandomState(0)
    const_batch = moments_batch(rs, b)

    results = {}

    if "fori_const" in variants:
        def make_fori(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(state, rng):
                def body(i, carry):
                    st, rng = carry
                    rng, sub = jax.random.split(rng)
                    st, _ = step_fn(st, const_batch, sub)
                    return (st, rng)
                st, _ = jax.lax.fori_loop(0, n, body, (state, rng))
                return st
            return run, (jax.random.PRNGKey(1),)
        results["fori_const"], state = two_point(make_fori, state, k1, k2,
                                                 "fori_const")

    if "scan_xs" in variants:
        def make_scan(n):
            batches = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[moments_batch(rs, b) for _ in range(n)])

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(state, rng):
                def body(carry, batch):
                    st, rng = carry
                    rng, sub = jax.random.split(rng)
                    st, metrics = step_fn(st, batch, sub)
                    return (st, rng), metrics
                (st, rng), metrics = jax.lax.scan(body, (state, rng), batches)
                return st, metrics
            return (lambda s, r: run(s, r)[0]), (jax.random.PRNGKey(1),)
        results["scan_xs"], state = two_point(make_scan, state, k1, k2,
                                              "scan_xs")

    cache = None
    if {"scan_cache", "dispatch_seq", "dispatch_deferred",
            "cli_state"} & set(variants):
        # 64-sample device cache, as the r5 launcher's --device_cache
        cache = moments_batch(np.random.RandomState(7), 64)
        del cache["input_ids"]

        def make_cached(n):
            idx = jnp.asarray(
                np.random.RandomState(3).randint(0, 64, (n, b)), jnp.int32)
            ids = jnp.asarray(
                np.random.RandomState(4).randint(0, 49408, (n, b, 77)),
                jnp.int32)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(state, rng, idx, ids):
                def body(carry, xs):
                    st, rng = carry
                    i, tok = xs
                    rng, sub = jax.random.split(rng)
                    batch = resolve_device_cache(
                        {"index": i, "input_ids": tok}, cache)
                    st, metrics = step_fn(st, batch, sub)
                    return (st, rng), metrics
                (st, rng), metrics = jax.lax.scan(body, (state, rng),
                                                  (idx, ids))
                return st, metrics
            return (lambda s, r, i=idx, t=ids: run(s, r, i, t)[0]), \
                (jax.random.PRNGKey(1),), \
                (lambda s, r, i=idx, t=ids: run(s, r, i, t))

    if "scan_cache" in variants:
        results["scan_cache"], state = two_point(
            lambda n: make_cached(n)[:2], state, k1, k2, "scan_cache")

    if "dispatch_deferred" in variants:
        # cli/train's one-dispatch-deferred drive: submit dispatch N, then
        # drain dispatch N-1's metrics -> TWO executions in flight through
        # the relay.  Compares against dispatch_seq (serialized) to price
        # the pipelining itself.
        _, a, full = make_cached(k2)
        state, m = full(state, *a)
        sync(m)
        pend, times = None, []
        for d in range(4):
            t0 = time.time()
            state, m = full(state, *a)
            if pend is not None:
                sync(pend)
            pend = m
            times.append(time.time() - t0)
        sync(pend)
        print(f"dispatch_deferred  {[round(t, 2) for t in times]} s per "
              f"{k2}-step dispatch = "
              f"{[round(k2 / t, 2) for t in times[1:]]} steps/s", flush=True)
        results["dispatch_deferred"] = k2 / min(times[1:])

    if "cli_state" in variants:
        # Reproduce cli/train's state provenance: every leaf re-put onto the
        # 1-device data mesh as a committed NamedSharding array (the
        # replicate_tree upload path), which flips the jit input signature
        # to the SPMD/GSPMD path.  Same values, same device — only the
        # sharding metadata (and thus the compiled program) changes.
        from jax.sharding import NamedSharding, PartitionSpec

        from reflecting_reality_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        repl = NamedSharding(mesh, PartitionSpec())
        leaves, td = jax.tree_util.tree_flatten(state)
        for i in range(len(leaves)):
            y = jax.device_put(leaves[i], repl)
            y.block_until_ready()
            leaves[i] = y  # old buffer freed here: bounded transient HBM
        state = jax.tree_util.tree_unflatten(td, leaves)
        del leaves
        print("state re-put as NamedSharding(mesh) — cli provenance",
              flush=True)
        f, a = make_cached(k2)[:2]
        state = f(state, *a)  # compile for the NamedSharding signature
        sync(state)
        seq = []
        for d in range(3):
            t0 = time.time()
            state = f(state, *a)
            sync(state)
            seq.append(time.time() - t0)
        print(f"cli_state     {[round(t, 2) for t in seq]} s per {k2}-step "
              f"dispatch = {[round(k2 / t, 2) for t in seq]} steps/s",
              flush=True)
        results["cli_state"] = k2 / min(seq)

    if "dispatch_seq" in variants:
        # consecutive donated dispatches of the k2 program, timed one by one
        f, a = make_cached(k2)[:2]
        out = f(state, *a)
        sync(out)
        state = out
        seq = []
        for d in range(3):
            t0 = time.time()
            state = f(state, *a)
            sync(state)
            seq.append(time.time() - t0)
        print(f"dispatch_seq  {[round(t, 2) for t in seq]} s per {k2}-step "
              f"dispatch = {[round(k2 / t, 2) for t in seq]} steps/s",
              flush=True)
        results["dispatch_seq"] = k2 / min(seq)

    print("\nsummary:", {k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
