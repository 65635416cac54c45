"""Generate golden dataset-transform outputs matching the reference repo.

The reference transforms (examples/brushnet/dataset/dataset.py:71-192) are
torchvision Compose pipelines; torchvision is not available here, so this
reproduces them with pure torch ops (torchvision.transforms.Resize on a
tensor is F.interpolate(mode='bicubic', antialias=True) over the shorter
side; CenterCrop and Normalize are trivial).  tests/test_data.py compares
our numpy/PIL reimplementations against these.  Run once:

    python tests/golden/generate_golden_dataset.py
"""

import os

import numpy as np
import torch
import torch.nn.functional as F

OUT = os.path.join(os.path.dirname(__file__), "dataset_transforms.npz")


def resize_shorter(t: torch.Tensor, res: int) -> torch.Tensor:
    # t: (C, H, W)
    h, w = t.shape[-2:]
    if h <= w:
        nh, nw = res, max(1, round(w * res / h))
    else:
        nh, nw = max(1, round(h * res / w)), res
    return F.interpolate(
        t[None], size=(nh, nw), mode="bicubic", antialias=True
    )[0]


def center_crop(t: torch.Tensor, res: int) -> torch.Tensor:
    h, w = t.shape[-2:]
    top, left = (h - res) // 2, (w - res) // 2
    return t[:, top : top + res, left : left + res]


def rgb_transform(image: np.ndarray, res: int) -> np.ndarray:
    t = torch.tensor(image, dtype=torch.float32).permute(2, 0, 1) / 255.0
    t = center_crop(resize_shorter(t, res), res)
    return ((t - 0.5) / 0.5).numpy()


def mask_transform(mask: np.ndarray, res: int) -> np.ndarray:
    t = torch.tensor(mask, dtype=torch.float32)[None] / 255.0
    return center_crop(resize_shorter(t, res), res).numpy()


def depth_transform(depth: np.ndarray, mask, method: str, res: int,
                    max_scene_depth=5.0, delta=0.5) -> np.ndarray:
    d = np.array(depth, dtype=np.float32)
    if method == "percentile":
        d2, d98 = np.percentile(d, 2), np.percentile(d, 98)
        unit = (np.clip(d, d2, d98) - d2) / (d98 - d2)
    else:
        if mask is not None:
            max_scene_depth = float(d[mask > 0].max()) + delta
        unit = np.clip(d, 0, max_scene_depth) / max_scene_depth
    norm = 2.0 * unit - 1.0
    t = torch.tensor(norm, dtype=torch.float32)[None]
    return center_crop(resize_shorter(t, res), res).numpy()


def normals_img_transform(normals: np.ndarray, res: int) -> np.ndarray:
    t = torch.tensor(normals, dtype=torch.float32).permute(2, 0, 1)
    t = center_crop(resize_shorter(t, res), res)
    return ((t - 0.5) / 0.5).numpy()


def normals_ip_transform(normals: np.ndarray, mask: np.ndarray) -> np.ndarray:
    mean = normals[mask > 0].mean(axis=0)
    return (mean / np.linalg.norm(mean)).astype(np.float32)[None]


def main():
    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, (600, 800, 3), dtype=np.uint8)
    mask = (rng.rand(600, 800) > 0.7).astype(np.uint8) * 255
    depth = (rng.rand(600, 800) * 8.0).astype(np.float32)
    normals = rng.rand(600, 800, 3).astype(np.float32)

    masked = image.copy()
    masked[mask == 255] = 0

    res = 512
    np.savez_compressed(
        OUT,
        image=image, mask=mask, depth=depth, normals=normals,
        rgb=rgb_transform(image, res),
        mask_t=mask_transform(mask, res),
        depth_msd=depth_transform(depth, mask, "max_scene_depth", res),
        depth_pct=depth_transform(depth, None, "percentile", res),
        normals_img=normals_img_transform(normals, res),
        normals_ip=normals_ip_transform(normals, mask),
        masked_image=masked,
    )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
