"""SD-inpainting baseline tests: conv_in inflation, train step, pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflecting_reality_tpu.baseline.sd_inpainting import (
    SDInpaintingPipeline,
    baseline_in_channels,
    inflate_conv_in_params,
    make_baseline_train_step,
)
from reflecting_reality_tpu.models.clip_text import CLIPTextModel
from reflecting_reality_tpu.models.unet2d import UNet2DConditionModel
from reflecting_reality_tpu.models.vae import AutoencoderKL
from reflecting_reality_tpu.training.train_step import TrainConfig
from tests.test_training import CFG, H, W, batch_of


def test_in_channels():
    assert baseline_in_channels(None, None) == 9
    assert baseline_in_channels("concat", None) == 10
    assert baseline_in_channels("latents", "concat") == 16


def test_inflate_conv_in():
    params = {"conv_in": {"kernel": np.arange(3 * 3 * 4 * 8, dtype=np.float32)
                          .reshape(3, 3, 4, 8), "bias": np.ones(8)}}
    out = inflate_conv_in_params(params, (3, 3, 10, 8), preserve=4)
    k = np.asarray(out["conv_in"]["kernel"])
    np.testing.assert_array_equal(k[:, :, :4], params["conv_in"]["kernel"])
    np.testing.assert_array_equal(k[:, :, 4:], 0)


@pytest.fixture(scope="module")
def baseline_setup():
    in_ch = baseline_in_channels("concat", None)  # 10
    unet = UNet2DConditionModel(sample_size=2, in_channels=in_ch, **CFG)
    vae = AutoencoderKL(block_out_channels=(4, 4, 4, 4), norm_num_groups=2)
    text = CLIPTextModel(vocab_size=100, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32)
    r = jax.random.split(jax.random.PRNGKey(0), 3)
    uparams = unet.init(r[0], jnp.zeros((1, 2, 2, in_ch)), jnp.array([1]),
                        jnp.zeros((1, 7, 16)))
    vparams = vae.init(r[1], jnp.zeros((1, H, W, 3)), jax.random.PRNGKey(9))
    tparams = text.init(r[2], jnp.zeros((1, 7), jnp.int32))
    return unet, uparams, vae, vparams, text, tparams


@pytest.mark.medium
def test_train_step(baseline_setup):
    unet, uparams, vae, vparams, text, tparams = baseline_setup
    config = TrainConfig(learning_rate=1e-3, lr_warmup_steps=0,
                         max_train_steps=10, depth_conditioning_mode="concat")
    step_fn, init_state = make_baseline_train_step(unet, vae, text, config)
    state = init_state(uparams, vparams, tparams)
    s1, m = jax.jit(step_fn)(state, batch_of(2), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               state.unet, s1.unet)
    assert max(jax.tree_util.tree_leaves(d)) > 0


@pytest.mark.integration
@pytest.mark.medium
def test_baseline_cli_journey(tmp_path):
    """The full baseline reproduction path (reference pairing:
    train_sdinpainting.py -> test_sdinpainting.py -> evaluate_metrics.py):
    train the 10-channel inpainting UNet, sweep checkpoints with the
    baseline tester (--all_ckpt through the shared drive), and push the
    grids through the metrics stack."""
    import os

    from tests.tiny_checkpoint import make_synmirror_data, make_tiny_sd_checkpoint

    pytest.importorskip("h5py")
    base = str(tmp_path / "base")
    data = str(tmp_path / "data")
    run = str(tmp_path / "run")
    make_tiny_sd_checkpoint(base)
    make_synmirror_data(data, n=8, size=64)

    from reflecting_reality_tpu.cli import train_baseline

    train_baseline.main([
        "--pretrained_model_name_or_path", base,
        "--train_data_dir", data,
        "--output_dir", run,
        "--resolution", "64",
        "--train_batch_size", "1",
        "--max_train_steps", "2",
        "--checkpointing_steps", "2",
        "--learning_rate", "1e-4",
        "--lr_warmup_steps", "0",
        "--depth_conditioning_mode", "concat",
        "--report_to", "none",
        "--seed", "0",
    ])
    assert os.path.isdir(os.path.join(run, "checkpoint-2", "unet"))

    from reflecting_reality_tpu.cli import test_baseline

    test_baseline.main([
        "--brushnet_path", run,           # root; --all_ckpt sweeps checkpoint-N
        "--all_ckpt",
        "--base_model_path", base,
        "--train_data_dir", data,
        "--resolution", "64",
        "--num_inference_steps", "2",
        "--num_images_per_validation", "4",
        "--depth_conditioning_mode", "concat",
        "--seed", "0",
    ])
    infer = os.path.join(run, "checkpoint-2", "inference")
    sheets = sorted(f for f in os.listdir(infer) if f.endswith(".png"))
    assert sheets == [f"uid{i}_{i}.png" for i in range(8)]
    from PIL import Image

    assert Image.open(os.path.join(infer, sheets[0])).size == (128, 128)

    # metrics flow over the baseline grids (PSNR/SSIM only: fast, torch-free)
    from reflecting_reality_tpu.metrics import evaluate as eval_cli

    eval_cli.main([
        "--train_data_dir", data, "--csv", "test.csv",
        "--infer_dir", infer, "--resolution", "64",
        "--num_images_per_validation", "4",
        "--mode", "calc", "--metrics", "PSNR", "SSIM",
    ])
    import pandas as pd

    df = pd.read_csv(os.path.join(infer, "eval_0.csv"))
    assert len(df) == 8 and df["PSNR"].notna().all() and df["SSIM"].notna().all()


def test_pipeline_smoke(baseline_setup):
    unet, uparams, vae, vparams, text, tparams = baseline_setup
    from reflecting_reality_tpu.data.tokenizer import HashTokenizer

    pipe = SDInpaintingPipeline(
        vae=(vae, vparams), text_encoder=(text, tparams),
        tokenizer=HashTokenizer(vocab_size=100), unet=(unet, uparams),
        depth_conditioning_mode="concat",
    )
    rng = np.random.RandomState(0)
    image = rng.rand(H, W, 3).astype(np.float32)
    mask = np.zeros((H, W, 3), np.float32)
    mask[4:12, 4:12] = 1.0
    depth = rng.rand(H, W, 1).astype(np.float32)
    out = pipe("a mirror", image, mask, depth=depth, num_inference_steps=2,
               seed=0)
    assert out.shape == (1, H, W, 3) and out.dtype == np.uint8
