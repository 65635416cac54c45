"""ctypes bindings for the native sample-transform kernels (native/transforms.cpp).

The reference gets transform parallelism from torch DataLoader worker
processes (train_brushnet_mirror.py:1242-1248); the TPU rebuild is one
process per host, so loader parallelism is a thread pool and the per-sample
pixel work must release the GIL to scale — ctypes calls do exactly that.

Loading policy:
- use the prebuilt `_native_transforms.so` next to this file if present;
- else build it once with g++ (quiet, ~2 s) into the same place;
- on any failure fall back to the numpy/PIL path (synmirror.py) silently.
- `RR_DISABLE_NATIVE=1` forces the numpy path (used by the parity tests).

All kernels are bit-parity ports of the numpy/PIL path (double-precision
PIL resample coefficients, float32 stores, same division rounding);
tests/test_native_transforms.py pins exactness.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SO_NAME = "_native_transforms.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False
_load_lock = threading.Lock()

_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i = ctypes.c_int
_f = ctypes.c_float


def _build(so_path: Path) -> bool:
    src = Path(__file__).resolve().parents[2] / "native" / "transforms.cpp"
    if not src.exists():
        return False
    # Compile to a unique temp name and rename into place: rename is atomic
    # within a directory, so a concurrent builder can never leave a truncated
    # .so that would then be loaded (and cached as broken) forever.
    tmp = so_path.with_name(f".{so_path.name}.{os.getpid()}.tmp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(tmp), str(src)],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so_path)
        return so_path.exists()
    except (OSError, subprocess.SubprocessError):
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None.

    Thread-safe: DataLoader worker threads may race to the first call."""
    if _tried:
        return _lib
    with _load_lock:
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("RR_DISABLE_NATIVE"):
        return None
    so_path = Path(__file__).with_name(_SO_NAME)
    if not so_path.exists() and not _build(so_path):
        return None
    try:
        lib = ctypes.CDLL(str(so_path))
        lib.rr_abi_version.restype = ctypes.c_int
        if lib.rr_abi_version() != 2:
            return None
        lib.rr_rgb_transform.argtypes = [_u8, _i, _i, _i, _i, _f32]
        lib.rr_mask_transform.argtypes = [_u8, _i, _i, _i, _f32]
        lib.rr_f32_img_transform.argtypes = [_f32, _i, _i, _i, _i, _f32]
        lib.rr_depth_transform.argtypes = [
            _f32, ctypes.c_void_p, _i, _i, _f, _f, _i, _i, _f32]
        lib.rr_depth_transform.restype = ctypes.c_int
        lib.rr_masked_image.argtypes = [
            _u8, _u8, _i, _i, _i, ctypes.c_uint8, _u8]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def rgb_transform(image: np.ndarray, resolution: int) -> Optional[np.ndarray]:
    """u8 HWC -> f32 (res,res,C) in [-1,1], or None if native unavailable."""
    lib = load()
    if lib is None or image.dtype != np.uint8 or image.ndim != 3:
        return None
    image = np.ascontiguousarray(image)
    h, w, c = image.shape
    out = np.empty((resolution, resolution, c), np.float32)
    lib.rr_rgb_transform(image, h, w, c, resolution, out)
    return out


def mask_transform(mask: np.ndarray, resolution: int) -> Optional[np.ndarray]:
    """u8 HW -> f32 (res,res,1) in [0,1], or None."""
    lib = load()
    if lib is None or mask.dtype != np.uint8 or mask.ndim != 2:
        return None
    mask = np.ascontiguousarray(mask)
    h, w = mask.shape
    out = np.empty((resolution, resolution, 1), np.float32)
    lib.rr_mask_transform(mask, h, w, resolution, out[:, :, 0])
    return out


def f32_img_transform(img: np.ndarray, resolution: int) -> Optional[np.ndarray]:
    """f32 HWC in [0,1] -> f32 (res,res,C) in [-1,1] (normals image mode)."""
    lib = load()
    if lib is None or img.ndim != 3:
        return None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    out = np.empty((resolution, resolution, c), np.float32)
    lib.rr_f32_img_transform(img, h, w, c, resolution, out)
    return out


def depth_transform(
    depth: np.ndarray,
    mask: Optional[np.ndarray],
    max_scene_depth: float,
    delta: float,
    to_pm1: bool,
    resolution: int,
) -> Optional[np.ndarray]:
    """max_scene_depth-mode depth normalization + resize + crop, or None."""
    lib = load()
    if lib is None or depth.ndim != 2:
        return None
    depth = np.ascontiguousarray(depth, np.float32)
    h, w = depth.shape
    if mask is not None:
        mask = np.ascontiguousarray(mask)
        if mask.dtype != np.uint8 or mask.shape != depth.shape:
            return None
        mask_p = mask.ctypes.data_as(ctypes.c_void_p)
    else:
        mask_p = None
    out = np.empty((resolution, resolution, 1), np.float32)
    rc = lib.rr_depth_transform(depth, mask_p, h, w, float(max_scene_depth),
                                float(delta), int(to_pm1), resolution,
                                out[:, :, 0])
    if rc != 0:
        # empty mask: fall back to numpy, which raises loudly (reference
        # depth[mask].max() semantics)
        return None
    return out


def masked_image(image: np.ndarray, mask: np.ndarray,
                 invert: bool = True) -> Optional[np.ndarray]:
    """image with the mask region zeroed (u8), or None."""
    lib = load()
    if (lib is None or image.dtype != np.uint8 or mask.dtype != np.uint8
            or image.ndim != 3 or mask.ndim != 2
            or image.shape[:2] != mask.shape):
        return None
    image = np.ascontiguousarray(image)
    mask = np.ascontiguousarray(mask)
    h, w, c = image.shape
    out = np.empty_like(image)
    sentinel = 255 if invert else 0
    lib.rr_masked_image(image, mask, h, w, c, sentinel, out)
    return out
