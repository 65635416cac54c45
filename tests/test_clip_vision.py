"""CLIP vision tower tests: shapes, preprocessing, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from reflecting_reality_tpu.models.clip_vision import (
    CLIPVisionModelWithProjection,
    clip_preprocess,
)


def test_preprocess():
    img = np.random.RandomState(0).randint(0, 256, (300, 400, 3), np.uint8)
    x = clip_preprocess(img, image_size=32)
    assert x.shape == (1, 32, 32, 3)
    assert np.isfinite(x).all()


def test_forward_shapes_and_determinism():
    m = CLIPVisionModelWithProjection(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, image_size=28, patch_size=14, projection_dim=8,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 28, 28, 3))
    params = m.init(jax.random.PRNGKey(1), x)
    last, emb = m.apply(params, x)
    assert last.shape == (2, 5, 16)  # 4 patches + cls
    assert emb.shape == (2, 8)
    last2, emb2 = m.apply(params, x)
    np.testing.assert_array_equal(np.asarray(emb), np.asarray(emb2))
    # transformers-compatible param paths
    p = params["params"]
    assert "vision_model" in p and "visual_projection" in p
    assert "patch_embedding" in p["vision_model"]["embeddings"]
