"""Helpers: build a tiny diffusers-layout SD checkpoint + synthetic SynMirror
data on disk, for CLI integration tests (reference tiny-model test pattern,
tests/models/test_modeling_common.py:198)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from reflecting_reality_tpu.core.io import save_pretrained
from reflecting_reality_tpu.models.clip_text import CLIPTextModel
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL

TINY_TEXT = dict(vocab_size=49408, hidden_size=32, num_hidden_layers=2,
                 num_attention_heads=2, intermediate_size=64,
                 max_position_embeddings=77)
TINY_UNET = dict(
    sample_size=8,
    block_out_channels=(8, 16, 16, 16),
    attention_head_dim=2,
    cross_attention_dim=32,
    norm_num_groups=4,
    layers_per_block=2,
)


def make_tiny_sd_checkpoint(base_dir: str, seed: int = 0) -> str:
    """Writes unet/ vae/ text_encoder/ tokenizer/ in reference layout."""
    rngs = jax.random.split(jax.random.PRNGKey(seed), 3)

    unet = UNet2DConditionModel(**TINY_UNET)
    uparams = unet.init(
        rngs[0], jnp.zeros((1, 8, 8, 4)), jnp.array([1]), jnp.zeros((1, 77, 32))
    )
    save_pretrained(unet, uparams["params"], os.path.join(base_dir, "unet"))

    vae = AutoencoderKL(block_out_channels=(4, 4, 4, 4), norm_num_groups=2)
    vparams = vae.init(rngs[1], jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(9))
    save_pretrained(vae, vparams["params"], os.path.join(base_dir, "vae"))

    text = CLIPTextModel(**TINY_TEXT)
    tparams = text.init(rngs[2], jnp.zeros((1, 77), jnp.int32))
    from reflecting_reality_tpu.core.io import flax_to_torch_state, save_safetensors

    tdir = os.path.join(base_dir, "text_encoder")
    os.makedirs(tdir, exist_ok=True)
    save_safetensors(flax_to_torch_state(tparams["params"]),
                     os.path.join(tdir, "model.safetensors"))
    with open(os.path.join(tdir, "config.json"), "w") as f:
        json.dump(TINY_TEXT, f)

    write_char_tokenizer(os.path.join(base_dir, "tokenizer"))
    return base_dir


def write_char_tokenizer(tok_dir: str) -> None:
    """A valid byte-level CLIP vocab with no merges: every word splits into
    byte tokens + '</w>' variants.  Token ids stay < 49408."""
    from reflecting_reality_tpu.data.tokenizer import _bytes_to_unicode

    os.makedirs(tok_dir, exist_ok=True)
    chars = list(_bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")


def make_synmirror_data(data_dir: str, n: int = 2, size: int = 64) -> None:
    """Synthetic SynMirror tree: obj/*.hdf5 + train.csv/test.csv."""
    import h5py
    import pandas as pd

    rng = np.random.RandomState(0)
    rows = []
    os.makedirs(os.path.join(data_dir, "obj"), exist_ok=True)
    for i in range(n):
        seg = np.zeros((size, size), np.uint8)
        q = size // 4
        seg[q : 3 * q, q : 3 * q] = 1
        seg[q + 2 : q + 8, q + 2 : q + 8] = 2
        cam = json.dumps({"cam2world": np.eye(4).tolist(),
                          "cam_K": np.eye(3).tolist()}).encode()
        with h5py.File(os.path.join(data_dir, f"obj/{i}.hdf5"), "w") as f:
            f["colors"] = rng.randint(0, 256, (size, size, 3), np.uint8)
            f["category_id_segmaps"] = seg
            f["depth"] = (rng.rand(size, size) * 5).astype(np.float32)
            f["normals"] = rng.rand(size, size, 3).astype(np.float32)
            f["cam_states"] = np.frombuffer(cam, dtype=np.uint8)
        rows.append({"uid": f"uid{i}", "path": f"obj/{i}.hdf5",
                     "auto_caption": f"a red cube number {i}"})
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(data_dir, "train.csv"), index=False)
    df.to_csv(os.path.join(data_dir, "test.csv"), index=False)
