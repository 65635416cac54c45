"""Weight I/O: safetensors <-> param pytrees, with torch-diffusers interop.

The reference stores weights as torch safetensors with dot-separated module
paths and OIHW conv kernels (reference: src/diffusers/models/modeling_utils.py:184).
Our linen modules keep the same module names (``down_blocks_0.resnets_1.conv1``)
so conversion is purely mechanical:

torch -> flax
  * conv   weight (4D)  OIHW -> HWIO, named ``kernel``
  * linear weight (2D)  transposed,  named ``kernel``
  * norm   weight (1D)               named ``scale``
  * embed  weight (2D, path-flagged) named ``embedding`` (no transpose)
  * bias                              named ``bias``

Checkpoints written by :func:`save_pretrained` are readable by the reference's
``from_pretrained`` (same folder layout: config.json + safetensors in torch
naming), satisfying the checkpoint-interop contract of SURVEY.md §5.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Iterable, Mapping, Set

import jax
import jax.numpy as jnp
import numpy as np

try:
    from safetensors.numpy import load_file as _st_load, save_file as _st_save
except ImportError:  # pragma: no cover
    _st_load = _st_save = None

WEIGHTS_NAME = "diffusion_pytorch_model.safetensors"

# Module-path suffixes whose 2D `weight` is an embedding table, not a linear.
DEFAULT_EMBEDDING_SUFFIXES = ("token_embedding", "position_embedding", "class_embedding")


def _torch_key_to_flax_path(key: str) -> tuple:
    """'down_blocks.0.resnets.1.conv1.weight' -> ('down_blocks_0','resnets_1','conv1','weight')."""
    parts = key.split(".")
    merged = []
    for p in parts:
        if re.fullmatch(r"\d+", p) and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return tuple(merged)


def _flax_path_to_torch_key(path: Iterable[str]) -> str:
    out = []
    for p in path:
        m = re.fullmatch(r"(.*?)_(\d+)", p)
        # Only split a trailing _<digits> if the stem is a known container name
        # (resnets_0 -> resnets.0) — leaf names like linear_1 must stay intact.
        if m and m.group(1) in _CONTAINER_STEMS:
            out.append(m.group(1))
            out.append(m.group(2))
        else:
            out.append(p)
    return ".".join(out)


# Container (ModuleList) stems used across the model zoo.  linear_1/linear_2,
# norm1... are real leaf module names and must NOT be split.
_CONTAINER_STEMS = {
    "down_blocks", "up_blocks", "resnets", "attentions", "transformer_blocks",
    "downsamplers", "upsamplers", "brushnet_down_blocks", "brushnet_up_blocks",
    "layers", "net", "to_out", "blocks",
}


def torch_to_flax_params(
    state_dict: Mapping[str, np.ndarray],
    embedding_suffixes: Iterable[str] = DEFAULT_EMBEDDING_SUFFIXES,
) -> Dict[str, Any]:
    """Convert a torch-layout numpy state dict into a nested flax param dict."""
    embedding_suffixes = tuple(embedding_suffixes)
    tree: Dict[str, Any] = {}
    for key, value in state_dict.items():
        path = list(_torch_key_to_flax_path(key))
        leaf = path[-1]
        parent = path[-2] if len(path) > 1 else ""
        arr = np.asarray(value)
        if leaf == "weight":
            if arr.ndim == 4:
                leaf, arr = "kernel", arr.transpose(2, 3, 1, 0)  # OIHW->HWIO
            elif arr.ndim == 2 and parent.endswith(embedding_suffixes):
                leaf = "embedding"
            elif arr.ndim == 2:
                leaf, arr = "kernel", arr.T
            elif arr.ndim == 1:
                leaf = "scale"
            else:
                raise ValueError(f"unsupported weight rank for {key}: {arr.shape}")
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[leaf] = arr
    return tree


def flax_to_torch_state(
    params: Mapping[str, Any],
    embedding_suffixes: Iterable[str] = DEFAULT_EMBEDDING_SUFFIXES,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`torch_to_flax_params` (for reference-compatible export)."""
    flat = jax.tree_util.tree_flatten_with_path(dict(params))[0]
    out: Dict[str, np.ndarray] = {}
    for keypath, value in flat:
        path = [k.key for k in keypath]
        leaf = path[-1]
        arr = np.asarray(value)
        if leaf == "kernel":
            leaf = "weight"
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T
        elif leaf == "scale":
            leaf = "weight"
        elif leaf == "embedding":
            leaf = "weight"
        torch_key = _flax_path_to_torch_key(path[:-1] + [leaf])
        out[torch_key] = arr
    return out


class WeightMappingError(ValueError):
    """A checkpoint's converted keys don't line up with the module's params."""


def convert_deprecated_attention_keys(
    state_dict: Dict[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """Remap old-vintage VAE/UNet attention keys in place and return the dict.

    Early diffusers checkpoints (incl. some runwayml/stable-diffusion-v1-5
    revisions) name the VAE mid-block attention projections
    ``query/key/value/proj_attn``; modern layouts use ``to_q/to_k/to_v/
    to_out.0`` (reference modeling_utils.py:929-971,
    _convert_deprecated_attention_blocks).  Some very old exports also store
    these as (C, C, 1, 1) conv kernels — squeeze those to 2D linears.
    """
    renames = {"query": "to_q", "key": "to_k", "value": "to_v",
               "proj_attn": "to_out.0"}
    for key in list(state_dict):
        parts = key.rsplit(".", 2)
        if len(parts) == 3 and parts[1] in renames and parts[2] in ("weight", "bias"):
            arr = state_dict.pop(key)
            if parts[2] == "weight" and arr.ndim == 4 and arr.shape[2:] == (1, 1):
                arr = arr[:, :, 0, 0]
            state_dict[f"{parts[0]}.{renames[parts[1]]}.{parts[2]}"] = arr
    return state_dict


def _flat_shapes(tree: Mapping[str, Any]) -> Dict[str, tuple]:
    flat = jax.tree_util.tree_flatten_with_path(dict(tree))[0]
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): tuple(leaf.shape)
        for path, leaf in flat
    }


def validate_loaded_params(module, params: Mapping[str, Any], where: str = "checkpoint",
                           allow_missing: Iterable[str] = ()) -> None:
    """Assert the loaded param tree matches the module's own init structure.

    Uses ``module.dummy_inputs()`` + ``jax.eval_shape`` (no FLOPs, no
    allocation — works at full SD-1.5 scale in seconds) to build the expected
    key set and shapes, then raises :class:`WeightMappingError` listing every
    missing key, unexpected key, and shape mismatch.  This is the loud-failure
    contract for real-checkpoint loads: a silent key mismatch is a quality
    bug, not a crash (SURVEY.md §7 "silent key mismatches = quality bugs").
    """
    dummy = getattr(module, "dummy_inputs", None)
    if dummy is None:
        return
    args, kwargs = dummy()
    expected = jax.eval_shape(
        lambda rng: module.init(rng, *args, **kwargs), jax.random.PRNGKey(0)
    )
    exp = _flat_shapes(expected.get("params", expected))
    got = _flat_shapes(params.get("params", params))
    allow_missing = tuple(allow_missing)
    missing = sorted(
        k for k in set(exp) - set(got)
        # e.g. to_k_ip/to_v_ip: grafted from the base weights after load
        # (reference train_brushnet_mirror.py:1085-1123)
        if not any(pat in k for pat in allow_missing)
    )
    unexpected = sorted(set(got) - set(exp))
    mismatched = sorted(
        f"{k}: checkpoint {got[k]} vs model {exp[k]}"
        for k in set(exp) & set(got) if exp[k] != got[k]
    )
    if missing or unexpected or mismatched:
        def _fmt(name, items):
            if not items:
                return ""
            shown = "\n    ".join(items[:12])
            more = f"\n    ... and {len(items) - 12} more" if len(items) > 12 else ""
            return f"\n  {name} ({len(items)}):\n    {shown}{more}"

        raise WeightMappingError(
            f"{type(module).__name__} <- {where}: weight mapping mismatch"
            + _fmt("missing from checkpoint", missing)
            + _fmt("unexpected in checkpoint", unexpected)
            + _fmt("shape mismatch", mismatched)
        )


def save_safetensors(state: Mapping[str, np.ndarray], path: str) -> None:
    if _st_save is None:
        raise ImportError("safetensors is required")
    _st_save({k: np.ascontiguousarray(v) for k, v in state.items()}, path)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    if _st_load is None:
        raise ImportError("safetensors is required")
    return dict(_st_load(path))


def save_pretrained(module, params, save_directory: str) -> None:
    """Write config.json + torch-layout safetensors (reference folder layout)."""
    os.makedirs(save_directory, exist_ok=True)
    module.save_config(save_directory)
    state = flax_to_torch_state(params)
    save_safetensors(state, os.path.join(save_directory, WEIGHTS_NAME))


def load_pretrained(cls, pretrained_path: str, subfolder: str | None = None,
                    validate: bool = True, allow_missing: Iterable[str] = (),
                    **overrides):
    """Load (module, params) from a reference-layout checkpoint folder.

    ``validate=True`` (default) checks the converted tree key-for-key and
    shape-for-shape against the module's init structure and raises
    :class:`WeightMappingError` on any mismatch — real-checkpoint loads fail
    loudly instead of silently producing degraded outputs.
    """
    root = os.path.join(pretrained_path, subfolder) if subfolder else pretrained_path
    config = cls.load_config(root)
    module = cls.from_config(config, **overrides)
    weights = None
    for name in (WEIGHTS_NAME, "diffusion_pytorch_model.fp16.safetensors"):
        p = os.path.join(root, name)
        if os.path.exists(p):
            weights = load_safetensors(p)
            break
    if weights is None:
        raise FileNotFoundError(f"no safetensors weights under {root}")
    params = torch_to_flax_params(convert_deprecated_attention_keys(weights))
    out = {"params": params}
    if validate:
        validate_loaded_params(module, out, where=root, allow_missing=allow_missing)
    return module, out


def cast_floating(tree, dtype):
    """Cast floating leaves of a pytree to `dtype` (param/optimizer dtype policy)."""
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_cast, tree)
