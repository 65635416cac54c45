"""Checkpoint save/load in the reference folder layout (reference:
train_brushnet_mirror.py:997-1069 save/load hooks and :1473-1498 pruning).

Layout per step N:
    checkpoint-N/
        brushnet/{config.json, diffusion_pytorch_model.safetensors}
        unet/...           (iff train_base_unet)
        ema/brushnet/...   (iff use_ema; rebuild extra — reference keeps EMA
                            only in accelerate's opaque state)
        train_state.msgpack  (optimizer state + step, for exact resume)

The model subfolders are written through core.io.save_pretrained, i.e. torch
key naming + OIHW kernels, so the reference's `from_pretrained` can load our
checkpoints directly (checkpoint-interop contract, SURVEY.md §5).

`prune_checkpoints` implements checkpoints_total_limit LRU semantics;
`latest_checkpoint` backs --resume_from_checkpoint=latest.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Iterable, Optional

import flax.serialization
import jax

from reflecting_reality_tpu.core.io import save_pretrained

_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def checkpoint_steps(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    steps = []
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    # Skip directories lacking train_state.msgpack (a crash mid-write could
    # only leave one via pre-atomic-rename checkpoints; a retrying launcher
    # must not resume from such a partial directory).
    for s in reversed(checkpoint_steps(output_dir)):
        path = os.path.join(output_dir, f"checkpoint-{s}")
        if os.path.isfile(os.path.join(path, "train_state.msgpack")):
            return path
    return None


def prune_checkpoints(output_dir: str, total_limit: Optional[int],
                      keep: Iterable[int] = ()) -> None:
    """Remove oldest checkpoints beyond total_limit (reference :1475-1494).
    Steps in `keep` (custom_checkpoints) are never pruned."""
    if not total_limit:
        return
    steps = [s for s in checkpoint_steps(output_dir) if s not in set(keep)]
    excess = len(steps) - (total_limit - 1)  # reference prunes BEFORE saving
    for s in steps[:max(excess, 0)]:
        shutil.rmtree(os.path.join(output_dir, f"checkpoint-{s}"), ignore_errors=True)


class _Snapshot:
    """Host copy of exactly the TrainState leaves a checkpoint writes —
    trainable, opt_state, ema, step.  The frozen components (vae/text/base
    unet, ~2 GB bf16 at SD-1.5 scale) are loaded from the base checkpoint on
    resume and never serialized, so fetching them back from the device per
    save would be pure device->host waste."""

    __slots__ = ("trainable", "opt_state", "ema", "step")

    def __init__(self, state):
        from reflecting_reality_tpu.parallel.mesh import fetch_tree

        host = fetch_tree({"trainable": state.trainable,
                           "opt_state": state.opt_state,
                           "ema": state.ema, "step": state.step})
        self.trainable = host["trainable"]
        self.opt_state = host["opt_state"]
        self.ema = host["ema"]
        self.step = host["step"]


def save_state(output_dir: str, step: int, state, brushnet_module, unet_module,
               total_limit: Optional[int] = None, keep: Iterable[int] = ()) -> str:
    prune_checkpoints(output_dir, total_limit, keep)
    final = os.path.join(output_dir, f"checkpoint-{step}")
    # Atomic publish: write everything into checkpoint-N.tmp, fsync-free
    # rename at the end.  A crash mid-write leaves only a .tmp directory,
    # which _CKPT_RE never matches, so latest_checkpoint() and a retrying
    # launcher see either a complete checkpoint or none (ADVICE r4).
    path = final + ".tmp"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    host_state = state if isinstance(state, _Snapshot) else _Snapshot(state)
    save_pretrained(brushnet_module, host_state.trainable["brushnet"]["params"],
                    os.path.join(path, "brushnet"))
    if "unet" in host_state.trainable:
        save_pretrained(unet_module, host_state.trainable["unet"]["params"],
                        os.path.join(path, "unet"))
    if "normal_proj" in host_state.trainable:
        # ip-adapter extras (reference writes ip_adapter/ip-adapter.bin,
        # :1018-1027); the trained to_k_ip/to_v_ip live in unet/ above.
        from reflecting_reality_tpu.core.io import flax_to_torch_state, save_safetensors

        ip_dir = os.path.join(path, "ip_adapter")
        os.makedirs(ip_dir, exist_ok=True)
        save_safetensors(
            flax_to_torch_state(host_state.trainable["normal_proj"]["params"]),
            os.path.join(ip_dir, "normal_proj.safetensors"),
        )
    if host_state.ema is not None:
        save_pretrained(brushnet_module, host_state.ema["brushnet"]["params"],
                        os.path.join(path, "ema", "brushnet"))
        if "unet" in host_state.ema:
            save_pretrained(unet_module, host_state.ema["unet"]["params"],
                            os.path.join(path, "ema", "unet"))

    with open(os.path.join(path, "train_state.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(
            {"step": host_state.step, "opt_state": host_state.opt_state}
        ))
    shutil.rmtree(final, ignore_errors=True)  # re-save of the same step
    os.rename(path, final)
    return final


class AsyncCheckpointer:
    """Overlap checkpoint IO with training (opt-in, --async_save).

    save() enqueues the device->host DMA for every array in the state
    (`copy_to_host_async`), snapshots the state to host memory (blocking
    only on the already-in-flight transfers — required because the jitted
    train step DONATES the state buffers, so they are gone after the next
    step), then hands the expensive part — torch-layout serialization +
    safetensors/msgpack file writes — to a background thread.  At most one
    save is in flight: a new save() (or wait()) joins the previous one
    first, and any exception from the background write re-raises there —
    call wait() after the loop so the final checkpoint is durable before
    exit.  No reference analogue (accelerate's save_state blocks,
    train_brushnet_mirror.py:1473-1498); the folder layout is identical.
    """

    def __init__(self):
        import threading

        self._threading = threading
        self._thread = None
        self._error = None

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def save(self, output_dir: str, step: int, state, brushnet_module,
             unet_module, total_limit: Optional[int] = None,
             keep: Iterable[int] = ()) -> None:
        self.wait()
        # bounded-in-flight snapshot of only the leaves a checkpoint writes
        # (see _Snapshot; chunked fetching also keeps a relayed TPU
        # transport from wedging).  Must complete before return — the
        # jitted train step donates the state buffers, so they are gone
        # after the next dispatch.
        host_state = _Snapshot(state)
        keep = tuple(keep)

        def run():
            try:
                save_state(output_dir, step, host_state, brushnet_module,
                           unet_module, total_limit=total_limit, keep=keep)
            except BaseException as e:  # re-raised by the next wait()/save()
                self._error = e

        self._thread = self._threading.Thread(target=run, daemon=True)
        self._thread.start()


def _load_params(path: str, subfolder: str) -> dict:
    from reflecting_reality_tpu.core.io import WEIGHTS_NAME, load_safetensors, torch_to_flax_params

    weights = load_safetensors(os.path.join(path, subfolder, WEIGHTS_NAME))
    return {"params": torch_to_flax_params(weights)}


def load_state(path: str, state):
    """Restore a TrainState template from checkpoint-N (exact resume)."""
    trainable = dict(state.trainable)
    trainable["brushnet"] = _load_params(path, "brushnet")
    if "unet" in trainable and os.path.isdir(os.path.join(path, "unet")):
        trainable["unet"] = _load_params(path, "unet")
    if "normal_proj" in trainable and os.path.isdir(os.path.join(path, "ip_adapter")):
        from reflecting_reality_tpu.core.io import load_safetensors, torch_to_flax_params

        w = load_safetensors(os.path.join(path, "ip_adapter", "normal_proj.safetensors"))
        trainable["normal_proj"] = {"params": torch_to_flax_params(w)}

    ema = state.ema
    if ema is not None and os.path.isdir(os.path.join(path, "ema", "brushnet")):
        ema = dict(ema)
        ema["brushnet"] = _load_params(path, "ema/brushnet")
        if "unet" in ema and os.path.isdir(os.path.join(path, "ema", "unet")):
            ema["unet"] = _load_params(path, "ema/unet")

    with open(os.path.join(path, "train_state.msgpack"), "rb") as f:
        restored = flax.serialization.from_bytes(
            {"step": jax.device_get(state.step),
             "opt_state": jax.device_get(state.opt_state)},
            f.read(),
        )
    return state.replace(
        step=restored["step"], opt_state=restored["opt_state"],
        trainable=trainable, ema=ema,
    )
