"""Dataset over precomputed VAE moments (tools/precompute_latents.py).

Serves batches with `latent_moments`/`cond_latent_moments` (+ per-mode
extras) instead of full-res pixels; training.train_step samples from the
cached DiagonalGaussian each step — statistically identical to the
reference's per-step encode, without the encoder FLOPs or HDF5 image reads.

Captions still come from the CSV at train time (empty-prompt dropout stays
stochastic per epoch, reference dataset.py:47-59).  random_flip is
unsupported by design: the cache stores one deterministic variant.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from reflecting_reality_tpu.data.rng import ItemRNG


def cache_name(row, index: int) -> str:
    """Stable per-sample cache filename shared by the precompute tool and
    the dataset: uid_<stem>.npz when a uid column exists, else <index>.npz."""
    try:
        uid = row["uid"]
    except (KeyError, IndexError):
        return f"{index}.npz"
    stem = os.path.splitext(os.path.basename(str(row["path"])))[0]
    return f"{uid}_{stem}.npz"


class LatentCachedDataset:
    """SynMirror training samples from a moments cache directory."""

    def __init__(
        self,
        cache_dir: str,
        df,
        tokenizer,
        proportion_empty_prompts: float = 0.1,
        mirror_prompt: str = "A perfect plane mirror reflection of ",
        caption_column: str = "auto_caption",
        seed: Optional[int] = None,
        **_: dict,
    ):
        self.cache_dir = cache_dir
        self.df = df
        self.tokenizer = tokenizer
        self.proportion_empty_prompts = proportion_empty_prompts
        self.mirror_prompt = mirror_prompt
        self.caption_column = caption_column
        # item-keyed Generators: draws depend only on (seed, epoch, index),
        # never on loader thread scheduling (data/rng.py)
        self.rng = ItemRNG(seed)
        missing = [
            cache_name(df.iloc[i], i)
            for i in range(min(len(df), 16))
            if not os.path.exists(os.path.join(cache_dir, cache_name(df.iloc[i], i)))
        ]
        if missing:
            raise FileNotFoundError(
                f"latent cache at {cache_dir} is missing {missing[:3]}... — "
                "run tools/precompute_latents.py first"
            )

    def __len__(self):
        return self.df.shape[0]

    def tokenize_caption(self, caption: str, rng=None) -> np.ndarray:
        rng = rng if rng is not None else self.rng.for_item(0)
        if rng.random() < self.proportion_empty_prompts:
            caption = ""
        elif isinstance(caption, str):
            caption = self.mirror_prompt + caption
        return np.asarray(self.tokenizer([caption])[0], dtype=np.int32)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        row = self.df.iloc[index]
        with np.load(os.path.join(self.cache_dir, cache_name(row, index))) as z:
            example = {k: z[k].astype(np.float32) for k in z.files}
        example["input_ids"] = self.tokenize_caption(
            str(row[self.caption_column]), self.rng.for_item(index))
        return example


class DeviceCacheIndexDataset:
    """Index-only view over a LatentCachedDataset for device-resident-cache
    training (cli/train.py --device_cache): the sample ARRAYS live on the
    accelerator (uploaded once by `materialize_cache`), so the host path per
    step is just the index and the tokenized caption.  Tokenization keeps
    LatentCachedDataset's exact item-RNG stream, so input_ids (incl. the
    empty-prompt dropout draws) are bit-identical to the host-cached path.
    """

    def __init__(self, inner: LatentCachedDataset):
        self.inner = inner
        self.rng = inner.rng  # DataLoader advances .rng.epoch per pass

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        row = self.inner.df.iloc[index]
        return {
            "index": np.asarray(index, np.int32),
            "input_ids": self.inner.tokenize_caption(
                str(row[self.inner.caption_column]),
                self.inner.rng.for_item(index)),
        }


def materialize_cache(dataset: LatentCachedDataset, transport_dtype=None,
                      max_bytes: Optional[int] = None,
                      transport_exempt: tuple = ()) -> Dict[str, np.ndarray]:
    """Stack the whole moments cache into host arrays {key: (N, ...)} ready
    for a one-time device upload.  Float arrays are cast to transport_dtype
    (bf16 under the bf16 step: bit-identical, the step casts anyway), except
    keys in transport_exempt (e.g. 'normals' under ip_adapter mode, consumed
    at fp32 by freq_encode).  Raises if the estimated footprint exceeds
    max_bytes (the cache must fit in HBM next to the train state)."""
    n = len(dataset)
    first = {k: v for k, v in dataset[0].items() if k != "input_ids"}
    per_sample = sum(v.nbytes // (2 if transport_dtype is not None and
                                  k not in transport_exempt and
                                  v.dtype == np.float32 else 1)
                     for k, v in first.items())
    total = per_sample * n
    if max_bytes is not None and total > max_bytes:
        raise ValueError(
            f"device cache would need {total / 1e9:.2f} GB for {n} samples "
            f"({per_sample / 1e3:.0f} KB each) > limit {max_bytes / 1e9:.2f} GB"
            " — raise RR_DEVICE_CACHE_MAX_GB or drop --device_cache")
    tdtype = np.dtype(transport_dtype) if transport_dtype is not None else None

    def casts_to_t(k, v):
        return tdtype is not None and k not in transport_exempt and v.dtype == np.float32

    out = {k: np.empty((n,) + v.shape, tdtype if casts_to_t(k, v) else v.dtype)
           for k, v in first.items()}
    for i in range(n):
        sample = dataset[i]
        for k in out:
            out[k][i] = np.asarray(sample[k]).astype(out[k].dtype, copy=False)
    return out
