"""Scorer models for the text-alignment / image-quality metric families
(reference: metrics/metrics.py — CLIP_Similarity via torchmetrics clip_score
:191-194, Aesthetic_Score via a LAION linear head over open_clip ViT-L image
features :86-106,167-182).

`build_extra_scorers` returns the `extra_scorers` dict MetricsCalculator
accepts, built from local checkpoint folders:

    clip_path:       transformers CLIP checkpoint with text_encoder/vision
                     halves (openai/clip-vit-large-patch14 layout)
    aesthetic_head:  the LAION sa_0_4_vit_l_14_linear.pth torch file

Image_Reward / HPS_V2.1 stay external-model hooks exactly as in the
reference (their scorers are full reward models; pass callables)."""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_extra_scorers(
    clip_path: Optional[str] = None,
    aesthetic_head: Optional[str] = None,
    dtype=jnp.float32,
) -> Dict[str, Callable]:
    scorers: Dict[str, Callable] = {}
    if clip_path is None:
        return scorers

    from reflecting_reality_tpu.data.tokenizer import CLIPTokenizer
    from reflecting_reality_tpu.models.clip_text import CLIPTextModelWithProjection, load_text_encoder
    from reflecting_reality_tpu.models.clip_vision import clip_preprocess, load_vision_encoder

    vision, vparams = load_vision_encoder(clip_path, subfolder=None, dtype=dtype)
    vision_apply = jax.jit(lambda p, x: vision.apply(p, x)[1])

    def image_embed(image: np.ndarray) -> jnp.ndarray:
        x = jnp.asarray(clip_preprocess(np.asarray(image), vision.image_size))
        emb = vision_apply(vparams, x)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    # CLIP similarity needs the text tower with projection.
    text_dir = os.path.join(clip_path, "text_encoder")
    has_text = os.path.isdir(text_dir) or os.path.exists(
        os.path.join(clip_path, "vocab.json")
    )
    if has_text:
        try:
            import json

            with open(os.path.join(clip_path, "config.json")) as f:
                raw = json.load(f).get("text_config", {})
            text = CLIPTextModelWithProjection(
                dtype=dtype,
                **{k: raw[k] for k in ("vocab_size", "hidden_size",
                                       "num_hidden_layers", "num_attention_heads",
                                       "intermediate_size", "projection_dim")
                   if k in raw},
            )
            _, tparams = load_text_encoder(clip_path, subfolder="", dtype=dtype)
            tokenizer = CLIPTokenizer.from_pretrained(clip_path)
            text_apply = jax.jit(lambda p, ids: text.apply(p, ids)[1])

            def clip_similarity(image, caption) -> float:
                """torchmetrics clip_score: 100 * max(cos(img, txt), 0)."""
                ie = image_embed(image)
                ids = jnp.asarray(tokenizer([caption]), jnp.int32)
                te = text_apply(tparams, ids)
                te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
                return float(jnp.maximum((ie * te).sum(), 0.0) * 100.0)

            scorers["CLIP_Similarity"] = clip_similarity
        except (FileNotFoundError, KeyError):
            pass

    if aesthetic_head is not None and os.path.exists(aesthetic_head):
        import torch

        sd = torch.load(aesthetic_head, map_location="cpu")
        w = jnp.asarray(sd["weight"].numpy())   # (1, 768)
        b = jnp.asarray(sd["bias"].numpy())     # (1,)

        def aesthetic(image, caption) -> float:
            ie = image_embed(image)
            return float(ie @ w.T + b)

        scorers["Aesthetic_Score"] = aesthetic

    return scorers
