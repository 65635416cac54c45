"""True multi-process (DCN-path) dryrun: 2 real `jax.distributed` processes.

The reference's production path is multi-process by construction
(`accelerate launch --num_processes=8`, slurm/train.sh:23-41; process-group
init at train_brushnet_mirror.py:902-907; eval barrier + CSV merge at
metrics/evaluate_metrics.py:376-381).  The TPU rebuild's equivalents
(`parallel.multihost.initialize`, loader process striding,
`mesh.shard_batch` via jax.make_array_from_process_local_data,
`metrics.evaluate.merge_csv_files`) were previously only exercised with
*emulated* processes; this tool runs them with `jax.process_count() == 2`
for real, on CPU (4 virtual devices per process -> one 8-device global mesh).

Checks executed per worker:
  1. jax.distributed.initialize through multihost.initialize (loud-failure
     contract) -> process_count==2, 8 global / 4 local devices.
  2. One jitted data-parallel train step on a global batch assembled with
     jax.make_array_from_process_local_data; the psum'd loss must be finite,
     identical on both processes, and identical to a single-process run of
     the same global batch (checked by the launcher).
  3. DataLoader process striding: each rank's local slices of two global
     batches are disjoint and union to the full shuffled order (launcher
     cross-checks the two ranks' index logs).
  4. multihost.barrier between phases (reference wait_for_everyone).
  5. Eval CSV shard flow: split_between_processes over 7 uids, per-rank
     shard CSVs, barrier, rank-0 merge_csv_files -> all cells present.

Usage:
  python -m reflecting_reality_tpu.tools.multiprocess_dryrun            # launcher
  (workers are spawned internally with --process_id)
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

LOCAL_DEVICES = 4
GLOBAL_BATCH = 8
N_UIDS = 7


# ---------------------------------------------------------------- worker ----

def _tiny_models():
    import jax
    import jax.numpy as jnp

    from reflecting_reality_tpu.models.brushnet import BrushNetModel
    from reflecting_reality_tpu.models.clip_text import CLIPTextModel
    from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
    from reflecting_reality_tpu.models.vae import AutoencoderKL

    cfg = dict(block_out_channels=(8, 16, 16, 16), attention_head_dim=2,
               cross_attention_dim=16, norm_num_groups=4, layers_per_block=2)
    unet = UNet2DConditionModel(sample_size=4, **cfg)
    brushnet = BrushNetModel(conditioning_channels=6, **cfg)
    vae = AutoencoderKL(block_out_channels=(4, 4, 4, 4), norm_num_groups=2)
    text = CLIPTextModel(vocab_size=100, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32)
    r = jax.random.split(jax.random.PRNGKey(0), 4)
    sample = jnp.zeros((1, 4, 4, 4))
    t = jnp.array([1])
    ehs = jnp.zeros((1, 7, 16))
    uparams = unet.init(r[0], sample, t, ehs)
    bparams = brushnet.init(r[1], sample, t, ehs, jnp.zeros((1, 4, 4, 6)))
    vparams = vae.init(r[2], jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(9))
    tparams = text.init(r[3], jnp.zeros((1, 7), jnp.int32))
    return unet, brushnet, vae, text, uparams, bparams, vparams, tparams


def _global_batch():
    import numpy as np

    rs = np.random.RandomState(0)
    H = W = 32
    b = GLOBAL_BATCH
    return {
        "pixel_values": rs.randn(b, H, W, 3).astype("float32"),
        "conditioning_pixel_values": rs.randn(b, H, W, 3).astype("float32"),
        "masks": (rs.rand(b, H, W, 1) > 0.5).astype("float32"),
        "depths": rs.randn(b, H, W, 1).astype("float32"),
        "input_ids": rs.randint(0, 100, (b, 7)).astype("int32"),
    }


def run_worker(args) -> None:
    import jax

    # the container's sitecustomize re-points JAX_PLATFORMS at the axon TPU
    # plugin after our env is set; force the virtual-device CPU platform
    # through jax.config (same recipe as tests/conftest.py) BEFORE any
    # backend-initializing call.
    jax.config.update("jax_platforms", "cpu")

    # NO persistent compile cache here: this jax/XLA version cannot reload
    # its own XLA:CPU AOT cache entries (the writer stamps pseudo-features
    # +prefer-no-scatter/+prefer-no-gather that the loader then rejects as
    # "unsupported on the host machine", fatally).  Workers recompile; the
    # AOT-compile + coordination barrier below keeps them in lockstep.

    multi = args.num_processes > 1
    if multi:
        from reflecting_reality_tpu.parallel import multihost

        multihost.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        assert jax.process_count() == args.num_processes, jax.process_count()
        assert jax.process_index() == args.process_id
        assert len(jax.local_devices()) == LOCAL_DEVICES, jax.local_devices()
    assert jax.device_count() == GLOBAL_BATCH, jax.device_count()

    import numpy as np

    from reflecting_reality_tpu.parallel import multihost
    from reflecting_reality_tpu.parallel.mesh import (
        make_mesh, replicate_tree, shard_batch, split_between_processes,
    )
    from reflecting_reality_tpu.training.train_step import TrainConfig, make_train_step

    # --- phase 1: sharded train step over the real 2-process mesh ---------
    unet, brushnet, vae, text, uparams, bparams, vparams, tparams = _tiny_models()
    config = TrainConfig(train_base_unet=True, snr_gamma=5.0)
    step_fn, init_state = make_train_step(unet, brushnet, vae, text, config)
    state = init_state(bparams, uparams, vparams, tparams)

    mesh = make_mesh(GLOBAL_BATCH)
    state = replicate_tree(state, mesh)

    full = _global_batch()
    local_bs = GLOBAL_BATCH // args.num_processes
    lo = args.process_id * local_bs
    local = {k: v[lo:lo + local_bs] for k, v in full.items()}
    batch = shard_batch(local, mesh, from_process_local=multi)

    # AOT-compile BEFORE the first cross-process collective executes: on a
    # slow host the per-process compile times skew by minutes, and the CPU
    # (gloo) collective rendezvous times out at ~30s.  Compiling first and
    # meeting at a coordination-service barrier removes the skew.
    compiled = jax.jit(step_fn).lower(state, batch, jax.random.PRNGKey(1)).compile()
    print(f"[{args.process_id}] compiled; entering barrier", flush=True)
    multihost.barrier("train-step-compiled")
    print(f"[{args.process_id}] executing train step", flush=True)
    new_state, metrics = compiled(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    print(f"[{args.process_id}] step done loss={loss}", flush=True)
    assert np.isfinite(loss), loss
    assert int(new_state.step) == 1

    multihost.barrier("after-train-step")

    # --- phase 2: loader process striding ----------------------------------
    from reflecting_reality_tpu.data.loader import DataLoader

    class IndexDataset:
        def __len__(self):
            return 4 * GLOBAL_BATCH + 3  # partial tail must be dropped

        def __getitem__(self, i):
            return {"idx": np.array([i], np.int64)}

    loader = DataLoader(IndexDataset(), batch_size=GLOBAL_BATCH, shuffle=True,
                        num_workers=2, seed=7,
                        process_index=args.process_id if multi else 0,
                        process_count=args.num_processes if multi else 1)
    local_indices = [b["idx"][:, 0].tolist() for b in loader]

    # --- phase 3: eval CSV shard flow --------------------------------------
    import pandas as pd

    from reflecting_reality_tpu.metrics import evaluate as ev

    uids = [f"uid{i:02d}" for i in range(N_UIDS)]
    my_uids = split_between_processes(uids)
    ev_args = argparse.Namespace(infer_dir=args.out_dir, output_csv="eval",
                                 num_images_per_validation=1)
    df = pd.DataFrame({c: [float("nan")] * len(uids) for c in ev.columns})
    df["uid"] = uids
    for uid in my_uids:
        row = uids.index(uid)
        df.at[row, "PSNR"] = 10.0 + row  # deterministic stand-in metric cell
    ev.save_dfs(ev_args, [df], shard_id=args.process_id)
    multihost.barrier("eval-shards-written")
    merged_ok = None
    if not multi or multihost.is_main_process():
        ev.merge_csv_files(ev_args, delete_intermediate=True)
        out = pd.read_csv(os.path.join(args.out_dir, "eval_0.csv"))
        merged_ok = (
            len(out) == N_UIDS
            and not out["PSNR"].isna().any()
            and np.allclose(sorted(out["PSNR"]), [10.0 + i for i in range(N_UIDS)])
        )
        assert merged_ok, out
    multihost.barrier("eval-merged")

    with open(os.path.join(args.out_dir, f"result_{args.process_id}.json"), "w") as f:
        json.dump({
            "process_id": args.process_id,
            "process_count": jax.process_count(),
            "device_count": jax.device_count(),
            "local_devices": len(jax.local_devices()),
            "loss": loss,
            "local_indices": local_indices,
            "merged_ok": merged_ok,
        }, f)
    print(f"worker {args.process_id}: ok loss={loss:.6f}", flush=True)


# -------------------------------------------------------------- launcher ----

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(out_dir: str, num_processes: int, process_id: int,
           coordinator: str, local_devices: int) -> subprocess.Popen:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONFAULTHANDLER"] = "1"
    env["PYTHONUNBUFFERED"] = "1"
    # a JAX_COMPILATION_CACHE_DIR / RRTPU_COMPILE_CACHE in the ambient env
    # must not leak in either (see the AOT-reload note in run_worker)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env.pop("RRTPU_COMPILE_CACHE", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            next((t for t in env.get("XLA_FLAGS", "").split()
                  if "xla_force_host_platform_device_count" in t), ""), "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    cmd = [sys.executable, "-m", "reflecting_reality_tpu.tools.multiprocess_dryrun",
           "--worker", "--process_id", str(process_id),
           "--num_processes", str(num_processes),
           "--coordinator", coordinator, "--out_dir", out_dir]
    log = open(os.path.join(out_dir, f"worker_{num_processes}p_{process_id}.log"), "w")
    return subprocess.Popen(cmd, env=env, stdout=log, stderr=subprocess.STDOUT,
                            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                                os.path.abspath(__file__)))))


def run_launcher(args) -> dict:
    out_dir = args.out_dir or tempfile.mkdtemp(prefix="rr_mpdryrun_")
    os.makedirs(out_dir, exist_ok=True)

    # 2-process run (4 devices each)
    coord = f"localhost:{_free_port()}"
    procs = [_spawn(out_dir, 2, i, coord, LOCAL_DEVICES) for i in range(2)]
    rcs = [p.wait(timeout=2400) for p in procs]
    for i, rc in enumerate(rcs):
        if rc != 0:
            log = open(os.path.join(out_dir, f"worker_2p_{i}.log")).read()
            raise RuntimeError(f"worker {i} failed (rc={rc}):\n{log[-4000:]}")
    results = [json.load(open(os.path.join(out_dir, f"result_{i}.json")))
               for i in range(2)]

    # single-process reference of the same global step (8 local devices)
    ref_dir = os.path.join(out_dir, "ref")
    os.makedirs(ref_dir, exist_ok=True)
    p = _spawn(ref_dir, 1, 0, "unused", GLOBAL_BATCH)
    if p.wait(timeout=2400) != 0:
        log = open(os.path.join(ref_dir, "worker_1p_0.log")).read()
        raise RuntimeError(f"single-process reference failed:\n{log[-4000:]}")
    ref = json.load(open(os.path.join(ref_dir, "result_0.json")))

    # ---- cross-process assertions ----
    assert results[0]["process_count"] == 2 and results[1]["process_count"] == 2
    assert results[0]["device_count"] == GLOBAL_BATCH
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6, (
        "psum'd loss differs across processes")
    assert abs(results[0]["loss"] - ref["loss"]) < 1e-5, (
        f"2-process loss {results[0]['loss']} != single-process "
        f"{ref['loss']} on the same global batch")
    # loader striding: per-batch slices disjoint, union == the 1-process order
    for b0, b1, bref in zip(results[0]["local_indices"],
                            results[1]["local_indices"],
                            ref["local_indices"]):
        assert not set(b0) & set(b1), "rank slices overlap"
        assert b0 + b1 == bref, "rank slices don't reassemble the global batch"
    assert results[0]["merged_ok"] is True

    summary = {
        "ok": True,
        "loss_2proc": results[0]["loss"],
        "loss_1proc": ref["loss"],
        "n_batches_checked": len(ref["local_indices"]),
        "out_dir": out_dir,
    }
    print("multiprocess_dryrun:", json.dumps(summary), flush=True)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--out_dir", default="")
    args = ap.parse_args()
    if args.worker:
        run_worker(args)
    else:
        run_launcher(args)


if __name__ == "__main__":
    main()
