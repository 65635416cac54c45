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
