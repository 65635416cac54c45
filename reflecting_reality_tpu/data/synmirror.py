"""SynMirror / MSD datasets (reference: examples/brushnet/dataset/dataset.py).

Same behavioral contracts, numpy/NHWC, no torch:

- extract_data_from_hdf5 (:205-223): colors / segmap==1 mirror mask x255 /
  segmap==2 object mask / depth / normals / cam_states; masked_image = image
  with the mirror region zeroed (:61-68).
- apply_transforms_rgb (:71-82): /255 -> resize SHORTER side to `resolution`
  (bicubic, torchvision.Resize semantics) -> center crop -> [-1,1].
- apply_transforms_mask (:85-96): /255 -> resize -> crop, stays [0,1].
- apply_transforms_depth (:99-166): `max_scene_depth` mode clips to
  (max depth over mirror mask + delta) then maps to [-1,1] (or [0,1]);
  `percentile` mode clips to the 2/98 percentiles.
- apply_transforms_normals (:168-192): image mode -> [-1,1]; `ip_adapter`
  mode -> unit-normalized mean normal over the mirror mask, shape (1, 3).
- tokenize_caption (:47-59): empty-prompt dropout + mirror-prompt prefix.
- decode_cam_states (:194-202): JSON bytes -> (cam2world, cam_K).
- MSDDataset (:274-321): png images/masks + Depth-Pro .npz depth.

Outputs are NHWC float32; the collate in data.loader stacks to batch dicts
matching training.train_step's expectations.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from reflecting_reality_tpu.data.rng import ItemRNG

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

from reflecting_reality_tpu.data import native as _native

MIRROR_PROMPT = "A perfect plane mirror reflection of "


def _resize_shorter_bicubic(arr: np.ndarray, resolution: int) -> np.ndarray:
    """torchvision Resize(resolution): scale so the SHORTER side == resolution."""
    h, w = arr.shape[:2]
    if h <= w:
        nh, nw = resolution, max(1, round(w * resolution / h))
    else:
        nh, nw = max(1, round(h * resolution / w)), resolution
    if (nh, nw) == (h, w):
        # scale-1 bicubic is the identity kernel (cubic(0)=1, cubic(+-1)=0)
        return arr
    squeeze = arr.ndim == 2
    a = arr[:, :, None] if squeeze else arr
    chans = []
    for c in range(a.shape[2]):
        im = Image.fromarray(a[:, :, c].astype(np.float32), mode="F")
        chans.append(np.asarray(im.resize((nw, nh), Image.BICUBIC)))
    out = np.stack(chans, axis=-1)
    return out[:, :, 0] if squeeze else out


def _center_crop(arr: np.ndarray, resolution: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = max(0, (h - resolution) // 2)
    left = max(0, (w - resolution) // 2)
    return arr[top : top + resolution, left : left + resolution]


def get_masked_image(image: np.ndarray, mask: np.ndarray, invert: bool = True) -> np.ndarray:
    if mask.ndim == 2:
        nat = _native.masked_image(image, mask, invert=invert)
        if nat is not None:
            return nat
    keep = (mask != 255) if invert else (mask != 0)
    if image.ndim == 3 and keep.ndim == 2:
        keep = keep[:, :, None]
    return image * keep.astype(image.dtype)


def apply_transforms_rgb(image: np.ndarray, resolution: int = 512) -> np.ndarray:
    """uint8 HWC -> float32 (res, res, 3) in [-1, 1].

    Crop is pure slicing and the normalize is elementwise, so both commute
    with each other exactly; doing resize -> crop -> fused (x/255-0.5)/0.5
    avoids two full-size temporaries vs the naive order."""
    if image.dtype == np.uint8 and image.ndim == 3:
        nat = _native.rgb_transform(image, resolution)
        if nat is not None:
            return nat
    x = image.astype(np.float32)
    x /= 255.0
    x = _center_crop(_resize_shorter_bicubic(x, resolution), resolution)
    x = np.ascontiguousarray(x)
    x -= 0.5
    x /= 0.5
    return x


def apply_transforms_mask(mask: np.ndarray, resolution: int = 512) -> np.ndarray:
    """uint8 HW -> float32 (res, res, 1) in [0, 1] (no normalize)."""
    if mask.dtype == np.uint8 and mask.ndim == 2:
        nat = _native.mask_transform(mask, resolution)
        if nat is not None:
            return nat
    x = mask.astype(np.float32) / 255.0
    x = _center_crop(_resize_shorter_bicubic(x, resolution), resolution)
    return x[:, :, None]


def apply_transforms_depth(
    depth_map: np.ndarray,
    mask: Optional[np.ndarray] = None,
    normalization_method: str = "max_scene_depth",
    max_scene_depth: float = 5.0,
    norm_range=(-1, 1),
    delta: float = 0.5,
    resolution: int = 512,
    **_: dict,
) -> np.ndarray:
    """-> float32 (res, res, 1) normalized depth."""
    depth = np.array(depth_map, dtype=np.float32)
    if mask is not None and mask.ndim == 3:
        mask = mask[:, :, 0]
    norm_range = list(norm_range)

    if (normalization_method == "max_scene_depth"
            and norm_range in ([0, 1], [-1, 1])
            and (mask is None or mask.dtype == np.uint8)):
        nat = _native.depth_transform(
            depth, mask, max_scene_depth, delta,
            to_pm1=(norm_range == [-1, 1]), resolution=resolution,
        )
        if nat is not None:
            return nat

    if normalization_method == "percentile":
        d2, d98 = np.percentile(depth, 2), np.percentile(depth, 98)
        clipped = np.clip(depth, d2, d98)
        unit = (clipped - d2) / (d98 - d2)
    elif normalization_method == "max_scene_depth":
        if mask is not None:
            bool_mask = mask > 0
            max_scene_depth = float(depth[bool_mask].max()) + delta
        clipped = np.clip(depth, 0, max_scene_depth)
        unit = clipped / max_scene_depth
    else:
        raise ValueError(normalization_method)

    if norm_range == [0, 1]:
        out = unit
    elif norm_range == [-1, 1]:
        out = 2.0 * unit - 1.0
    else:
        raise ValueError(norm_range)

    out = _center_crop(_resize_shorter_bicubic(out, resolution), resolution)
    return out[:, :, None].astype(np.float32)


def apply_transforms_normals(
    normals_map: np.ndarray,
    resolution: int = 512,
    mask: Optional[np.ndarray] = None,
    normals_conditioning_mode: str = "ip_adapter",
    **_: dict,
) -> np.ndarray:
    if normals_conditioning_mode == "ip_adapter":
        bool_mask = mask > 0
        mean = normals_map[bool_mask].mean(axis=0)
        return (mean / np.linalg.norm(mean)).astype(np.float32)[None, :]  # (1, 3)
    x = normals_map.astype(np.float32)
    if x.ndim == 3:
        nat = _native.f32_img_transform(x, resolution)
        if nat is not None:
            return nat
    x = _center_crop(_resize_shorter_bicubic(x, resolution), resolution)
    return (x - 0.5) / 0.5


def normals_to_uint8(normals: np.ndarray) -> np.ndarray:
    """HDF5 normals are float in [0, 1] (see apply_transforms_normals);
    converting to a uint8 image needs the x255 scale — a bare uint8 cast
    truncates everything to 0 (a black image).  uint8 input passes through."""
    arr = np.asarray(normals)
    if arr.dtype == np.uint8:
        return arr
    return np.round(np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)


def decode_cam_states(cam_states: np.ndarray):
    data = json.loads(np.asarray(cam_states).tobytes().decode("utf-8"))
    return data["cam2world"], data["cam_K"]


def extract_data_from_hdf5(
    hdf5_data, random_flip: bool = False, keys=None
) -> Dict[str, np.ndarray]:
    """Decode one SynMirror sample (reference dataset.py:205-223).

    `keys=None` reads everything (reference behavior).  Passing a subset
    skips the HDF5 reads + dtype conversions of unused planes — the training
    loader in depth-concat mode never touches `normals`/`cam_states`, which
    is ~40% of the bytes per sample."""
    want = set(keys) if keys is not None else {
        "image", "mask", "object_mask", "depth", "normals", "cam_states",
        "masked_image",
    }
    data: Dict[str, np.ndarray] = {}
    if want & {"mask", "object_mask", "masked_image"}:
        segmap = np.array(hdf5_data["category_id_segmaps"], dtype=np.uint8)
        if "mask" in want or "masked_image" in want:
            data["mask"] = (segmap == 1).astype(np.uint8) * 255
        if "object_mask" in want:
            data["object_mask"] = (segmap == 2).astype(np.uint8) * 255
    if want & {"image", "masked_image"}:
        data["image"] = np.array(hdf5_data["colors"], dtype=np.uint8)
    if "depth" in want:
        data["depth"] = np.array(hdf5_data["depth"])
    if "normals" in want:
        data["normals"] = np.array(hdf5_data["normals"])
    if "cam_states" in want:
        data["cam_states"] = np.array(hdf5_data["cam_states"])
    if "masked_image" in want:
        data["masked_image"] = get_masked_image(data["image"], data["mask"])
    if random_flip:
        for key in ["image", "mask", "object_mask", "masked_image", "depth", "normals"]:
            if key in data:
                data[key] = np.fliplr(data[key])
    if keys is not None:
        data = {k: v for k, v in data.items() if k in want}
    return data


class HDF5Dataset:
    """SynMirror dataset over a pandas-style index (needs `path` and caption
    columns; any object with .iloc and .shape works)."""

    def __init__(
        self,
        data_root: str,
        df,
        tokenizer,
        resolution: int = 512,
        proportion_empty_prompts: float = 0.1,
        mirror_prompt: str = MIRROR_PROMPT,
        caption_column: str = "auto_caption",
        random_flip: bool = False,
        seed: Optional[int] = None,
        **kwargs,
    ):
        if h5py is None:
            raise ImportError("h5py is required for HDF5Dataset")
        self.data_root = Path(data_root)
        self.df = df
        self.tokenizer = tokenizer
        self.resolution = resolution
        self.proportion_empty_prompts = proportion_empty_prompts
        self.mirror_prompt = mirror_prompt
        self.caption_column = caption_column
        self.random_flip = random_flip
        self.rng = ItemRNG(seed)
        self.kwargs = kwargs

    def __len__(self):
        return self.df.shape[0]

    def tokenize_caption(self, caption: str,
                         rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng if rng is not None else self.rng.for_item(0)
        if rng.random() < self.proportion_empty_prompts:
            caption = ""
        elif isinstance(caption, str):
            caption = self.mirror_prompt + caption
        return np.asarray(self.tokenizer([caption])[0], dtype=np.int32)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        row = self.df.iloc[index]
        caption = str(row[self.caption_column])
        hdf5_path = self.data_root / str(row["path"])

        # item-keyed rng: draws depend only on (seed, epoch, index), never on
        # which loader thread runs this item (see data/rng.py)
        rng = self.rng.for_item(index)
        flip = self.random_flip and rng.random() < 0.5
        keys = {"image", "mask"}
        if not self.kwargs.get("hint_map_dir"):
            keys.add("masked_image")
        if self.kwargs.get("depth", False):
            keys.add("depth")
        if self.kwargs.get("normals_conditioning_mode", False):
            keys.add("normals")
        if self.kwargs.get("cam_states", False):
            keys.add("cam_states")
        with h5py.File(hdf5_path, "r") as f:
            data = extract_data_from_hdf5(f, random_flip=flip, keys=keys)

        example = {
            "pixel_values": apply_transforms_rgb(data["image"], self.resolution),
            "masks": apply_transforms_mask(data["mask"], self.resolution),
            "input_ids": self.tokenize_caption(caption, rng),
        }

        hint_dir = self.kwargs.get("hint_map_dir")
        if hint_dir:
            hint_path = os.path.join(
                str(self.data_root), hint_dir, str(row["path"]).replace("hdf5", "png")
            )
            hint = np.array(Image.open(hint_path))
            example["conditioning_pixel_values"] = apply_transforms_rgb(hint, self.resolution)
        else:
            example["conditioning_pixel_values"] = apply_transforms_rgb(
                data["masked_image"], self.resolution
            )

        if self.kwargs.get("depth", False):
            example["depths"] = apply_transforms_depth(
                data["depth"], mask=data["mask"], resolution=self.resolution, **self.kwargs
            )
        if self.kwargs.get("normals_conditioning_mode", False):
            example["normals"] = apply_transforms_normals(
                data["normals"], resolution=self.resolution, mask=data["mask"], **self.kwargs
            )
        if self.kwargs.get("cam_states", False):
            cam2world, cam_K = decode_cam_states(data["cam_states"])
            example["cam2world"] = np.asarray(cam2world, np.float32)
            example["cam_K"] = np.asarray(cam_K, np.float32)
        return example


class MSDDataset(HDF5Dataset):
    """Real-world Mirror Segmentation Dataset: png images/masks + Depth-Pro
    .npz depth (reference: dataset.py:274-321)."""

    def __init__(self, data_root, df, tokenizer, mirror_prompt: str = "",
                 caption_column: str = "auto_caption", path_column: str = "path",
                 **kwargs):
        # h5py not needed; bypass the parent's import check if missing.
        self.data_root = Path(data_root)
        self.df = df
        self.tokenizer = tokenizer
        self.resolution = kwargs.pop("resolution", 512)
        self.proportion_empty_prompts = kwargs.pop("proportion_empty_prompts", 0.1)
        self.mirror_prompt = mirror_prompt
        self.caption_column = caption_column
        self.random_flip = kwargs.pop("random_flip", False)
        self.rng = ItemRNG(kwargs.pop("seed", None))
        self.kwargs = kwargs
        self.path_column = path_column
        self.images_dir = self.data_root / "images"
        self.masks_dir = self.data_root / "masks"
        self.depth_dir = self.data_root / "depth"

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        row = self.df.iloc[index]
        caption = str(row[self.caption_column])
        image_path = str(row[self.path_column])

        image = np.array(Image.open(str(self.images_dir / image_path)))
        orig_mask = np.array(Image.open(str(self.masks_dir / image_path)))
        masked_image = get_masked_image(image, orig_mask)

        example = {
            "pixel_values": apply_transforms_rgb(image, self.resolution),
            "conditioning_pixel_values": apply_transforms_rgb(masked_image, self.resolution),
            "masks": apply_transforms_mask(orig_mask, self.resolution),
            "input_ids": self.tokenize_caption(caption, self.rng.for_item(index)),
        }
        if self.kwargs.get("depth", False):
            depth = np.load(self.depth_dir / image_path.replace("png", "npz"))["depth"]
            example["depths"] = apply_transforms_depth(
                depth, mask=orig_mask, resolution=self.resolution, **self.kwargs
            )
        return example
