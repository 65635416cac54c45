"""End-to-end CLI integration: tiny SD checkpoint -> train 2 steps w/
checkpointing + resume -> inference driver -> grid sheets on disk.

This is the full reference user journey (train_brushnet_mirror.py ->
test_brushnet.py) on miniature models."""

import os

import numpy as np
import pytest

from tests.tiny_checkpoint import make_synmirror_data, make_tiny_sd_checkpoint


def _make_lpips_npz(path):
    """Random-init LPIPS weights (hermetic; scores are consistent, not
    calibrated — enough to exercise the validation LPIPS plumbing)."""
    import jax
    import jax.numpy as jnp

    from reflecting_reality_tpu.metrics.lpips import LPIPS, save_lpips_npz

    params = LPIPS().init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))
    params = jax.tree_util.tree_map(lambda x: np.abs(np.asarray(x)), params)
    save_lpips_npz(params, path)
    return path


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    pytest.importorskip("h5py")
    base = tmp_path_factory.mktemp("sd_tiny")
    data = tmp_path_factory.mktemp("data")
    make_tiny_sd_checkpoint(str(base))
    # 8 virtual devices x train_batch_size 1 -> need >= 8 samples
    make_synmirror_data(str(data), n=8, size=64)
    return str(base), str(data)


@pytest.mark.integration
class TestCLIJourney:
    @pytest.mark.medium
    def test_train_checkpoint_resume_infer(self, env, tmp_path):
        base, data = env
        out = str(tmp_path / "run")

        from reflecting_reality_tpu.cli import train as train_cli

        argv = [
            "--pretrained_model_name_or_path", base,
            "--train_data_dir", data,
            "--output_dir", out,
            "--resolution", "64",
            "--train_batch_size", "1",
            "--max_train_steps", "2",
            "--checkpointing_steps", "1",
            "--checkpoints_total_limit", "2",
            "--learning_rate", "1e-4",
            "--lr_warmup_steps", "0",
            "--depth_conditioning_mode", "concat",
            "--dataloader_num_workers", "2",
            "--report_to", "none",
            "--logging_dir", os.path.join(out, "logs"),
            "--validation_steps", "2",
            "--num_validation_images", "1",
            "--num_images_per_validation", "2",
            "--num_inference_steps", "2",
            "--seed", "0",
            "--log_every", "1",
            "--lpips_weights", _make_lpips_npz(str(tmp_path / "lpips.npz")),
        ]
        train_cli.main(argv)
        # validation ran at step 2: score-stamped grid sheet on disk
        val_dir = os.path.join(out, "validation", "step-2")
        assert os.path.isdir(val_dir) and len(os.listdir(val_dir)) == 1
        # validation logged LPIPS alongside PSNR/SSIM (reference
        # train_brushnet_mirror.py:238)
        import json

        with open(os.path.join(out, "logs", "metrics.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        val_rows = [r for r in rows if "val/lpips" in r]
        assert val_rows and np.isfinite(val_rows[-1]["val/lpips"])

        ckpt2 = os.path.join(out, "checkpoint-2")
        assert os.path.isdir(os.path.join(ckpt2, "brushnet"))
        assert os.path.exists(
            os.path.join(ckpt2, "brushnet", "diffusion_pytorch_model.safetensors")
        )
        assert os.path.exists(os.path.join(ckpt2, "brushnet", "config.json"))
        assert os.path.exists(os.path.join(ckpt2, "train_state.msgpack"))
        # metrics jsonl written
        assert os.path.getsize(os.path.join(out, "logs", "metrics.jsonl")) > 0

        # resume from latest (validation off for speed)
        argv_resume = list(argv)
        argv_resume[argv_resume.index("--validation_steps") + 1] = "0"
        train_cli.main(argv_resume + ["--resume_from_checkpoint", "latest",
                                      "--max_train_steps", "3"])
        assert os.path.isdir(os.path.join(out, "checkpoint-3"))

        # inference over the trained checkpoint
        from reflecting_reality_tpu.cli import test as test_cli

        infer_out = str(tmp_path / "infer")
        test_cli.main([
            "--brushnet_path", ckpt2,
            "--base_model_path", base,
            "--train_data_dir", data,
            "--output_dir", infer_out,
            "--resolution", "64",
            "--num_inference_steps", "2",
            "--num_images_per_validation", "4",
            "--depth_conditioning_mode", "concat",
            "--seed", "0",
        ])
        from PIL import Image

        sheets = sorted(os.listdir(infer_out))
        assert sheets == [f"uid{i}_{i}.png" for i in range(8)]
        img = Image.open(os.path.join(infer_out, sheets[0]))
        assert img.size == (128, 128)  # 2x2 grid of 64x64

        # idempotent restart: second run must not rewrite
        mtimes = {s: os.path.getmtime(os.path.join(infer_out, s)) for s in sheets}
        test_cli.main([
            "--brushnet_path", ckpt2,
            "--base_model_path", base,
            "--train_data_dir", data,
            "--output_dir", infer_out,
            "--resolution", "64",
            "--num_inference_steps", "2",
            "--depth_conditioning_mode", "concat",
        ])
        for s in sheets:
            assert os.path.getmtime(os.path.join(infer_out, s)) == mtimes[s]

    @pytest.mark.medium
    def test_ip_adapter_journey(self, env, tmp_path):
        """Train -> checkpoint -> infer in normals ip_adapter mode: the
        validation path projects the mean mirror normal, the checkpoint
        carries unet/ (with to_k_ip/to_v_ip) + ip_adapter/normal_proj, and
        the inference driver reloads all of it via from_pretrained."""
        base, data = env
        out = str(tmp_path / "run_ip")

        from reflecting_reality_tpu.cli import train as train_cli

        train_cli.main([
            "--pretrained_model_name_or_path", base,
            "--train_data_dir", data,
            "--output_dir", out,
            "--resolution", "64",
            "--train_batch_size", "1",
            "--max_train_steps", "2",
            "--checkpointing_steps", "2",
            "--learning_rate", "1e-4",
            "--lr_warmup_steps", "0",
            "--depth_conditioning_mode", "concat",
            "--normals_conditioning_mode", "ip_adapter",
            "--dataloader_num_workers", "2",
            "--report_to", "none",
            "--logging_dir", os.path.join(out, "logs"),
            "--validation_steps", "2",
            "--num_validation_images", "1",
            "--num_images_per_validation", "1",
            "--num_inference_steps", "2",
            "--seed", "0",
            "--log_every", "1",
        ])
        ckpt = os.path.join(out, "checkpoint-2")
        # ip mode saves the unet (to_k_ip/to_v_ip live there) + normal_proj
        assert os.path.exists(
            os.path.join(ckpt, "unet", "diffusion_pytorch_model.safetensors")
        )
        assert os.path.exists(
            os.path.join(ckpt, "ip_adapter", "normal_proj.safetensors")
        )
        # validation actually ran (no silent swallow)
        val_dir = os.path.join(out, "validation", "step-2")
        assert os.path.isdir(val_dir) and len(os.listdir(val_dir)) == 1

        from reflecting_reality_tpu.cli import test as test_cli

        infer_out = str(tmp_path / "infer_ip")
        test_cli.main([
            "--brushnet_path", os.path.join(ckpt, "brushnet"),
            "--base_model_path", base,
            "--train_data_dir", data,
            "--output_dir", infer_out,
            "--resolution", "64",
            "--num_inference_steps", "2",
            "--num_images_per_validation", "1",
            "--depth_conditioning_mode", "concat",
            "--normals_conditioning_mode", "ip_adapter",
            "--normal_source", "gt",
            "--num_samples", "2",
            "--seed", "0",
        ])
        assert len(os.listdir(infer_out)) == 2

    @pytest.mark.medium
    def test_int8_inference_flag(self, env, tmp_path, monkeypatch):
        """--int8 wires pipe.enable_int8() into the inference driver: make a
        brushnet checkpoint via the from_unet surgery (no training), run the
        driver quantized, and check sheets land on disk.  The tiny config's
        kernels are below the production selection threshold, so the policy
        is widened for the test (the production policy itself is pinned in
        tests/test_quant.py)."""
        import jax
        import numpy as np

        base, data = env
        from reflecting_reality_tpu.core.io import load_pretrained, save_pretrained
        from reflecting_reality_tpu.models import UNet2DConditionModel
        from reflecting_reality_tpu.models.brushnet import (
            BrushNetModel,
            init_params_from_unet,
        )

        unet_module, unet_params = load_pretrained(
            UNet2DConditionModel, base, subfolder="unet"
        )
        cfg = BrushNetModel.config_from_unet(unet_module, conditioning_channels=6)
        brushnet = BrushNetModel.from_config(cfg)
        bparams = brushnet.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 8, 8, 4), np.float32),
            np.zeros((1,), np.int32),
            np.zeros((1, 77, unet_module.cross_attention_dim), np.float32),
            np.zeros((1, 8, 8, 6), np.float32),
        )
        bparams = init_params_from_unet(
            jax.device_get(bparams)["params"], unet_params["params"]
        )
        ckpt = str(tmp_path / "ckpt" / "brushnet")
        save_pretrained(brushnet, bparams, ckpt)

        import reflecting_reality_tpu.ops.quant as quant

        monkeypatch.setattr(
            quant, "default_select",
            lambda k: hasattr(k, "ndim") and k.ndim in (2, 4),
        )

        from reflecting_reality_tpu.cli import test as test_cli

        infer_out = str(tmp_path / "infer_int8")
        test_cli.main([
            "--brushnet_path", ckpt,
            "--base_model_path", base,
            "--train_data_dir", data,
            "--output_dir", infer_out,
            "--resolution", "64",
            "--num_inference_steps", "2",
            "--num_images_per_validation", "1",
            "--depth_conditioning_mode", "concat",
            "--num_samples", "2",
            "--seed", "0",
            "--int8",
        ])
        assert len(os.listdir(infer_out)) == 2

    @pytest.mark.medium
    def test_cached_mode_inference_flags(self, env, tmp_path):
        """--deep_cache / --encoder_reuse wire the cached serving modes into
        the inference driver (mode math itself is pinned in
        tests/test_deepcache.py; mutual exclusion in tests/test_pipeline.py)."""
        import jax
        import numpy as np

        base, data = env
        from reflecting_reality_tpu.core.io import load_pretrained, save_pretrained
        from reflecting_reality_tpu.models import UNet2DConditionModel
        from reflecting_reality_tpu.models.brushnet import (
            BrushNetModel,
            init_params_from_unet,
        )

        unet_module, unet_params = load_pretrained(
            UNet2DConditionModel, base, subfolder="unet"
        )
        cfg = BrushNetModel.config_from_unet(unet_module, conditioning_channels=6)
        brushnet = BrushNetModel.from_config(cfg)
        bparams = brushnet.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 8, 8, 4), np.float32),
            np.zeros((1,), np.int32),
            np.zeros((1, 77, unet_module.cross_attention_dim), np.float32),
            np.zeros((1, 8, 8, 6), np.float32),
        )
        bparams = init_params_from_unet(
            jax.device_get(bparams)["params"], unet_params["params"]
        )
        ckpt = str(tmp_path / "ckpt" / "brushnet")
        save_pretrained(brushnet, bparams, ckpt)

        from reflecting_reality_tpu.cli import test as test_cli

        infer_out = str(tmp_path / "infer_dc")
        test_cli.main([
            "--brushnet_path", ckpt,
            "--base_model_path", base,
            "--train_data_dir", data,
            "--output_dir", infer_out,
            "--resolution", "64",
            "--num_inference_steps", "4",
            "--num_images_per_validation", "1",
            "--depth_conditioning_mode", "concat",
            "--num_samples", "1",
            "--seed", "0",
            "--deep_cache", "2",
        ])
        assert len(os.listdir(infer_out)) == 1


@pytest.mark.integration
@pytest.mark.medium
def test_nonfinite_loss_guard(tmp_path):
    """A NaN in the input pipeline must abort training with a clear error
    and a final checkpoint, not run to max_steps on poisoned weights."""
    import h5py
    import numpy as np

    base = str(tmp_path / "base")
    data = str(tmp_path / "data")
    out = str(tmp_path / "run")
    make_tiny_sd_checkpoint(base)
    make_synmirror_data(data, n=8, size=64)
    # poison every sample's depth with NaN -> cond latents -> NaN loss
    for i in range(8):
        p = os.path.join(data, f"obj/{i}.hdf5")
        with h5py.File(p, "r+") as f:
            d = np.array(f["depth"])
            d[:] = np.nan
            del f["depth"]
            f["depth"] = d

    from reflecting_reality_tpu.cli import train as train_cli

    argv = [
        "--pretrained_model_name_or_path", base,
        "--train_data_dir", data,
        "--output_dir", out,
        "--resolution", "64",
        "--train_batch_size", "1",
        "--max_train_steps", "50",
        "--checkpointing_steps", "100",
        "--learning_rate", "1e-4",
        "--lr_warmup_steps", "0",
        "--depth_conditioning_mode", "concat",
        "--report_to", "none",
        "--logging_dir", os.path.join(out, "logs"),
        "--validation_steps", "0",
        "--seed", "0",
        "--log_every", "1",
        "--max_nonfinite_steps", "2",
    ]
    with pytest.raises(FloatingPointError, match="non-finite"):
        train_cli.main(argv)
    # the guard saved a last checkpoint before aborting...
    ckpts = [d for d in os.listdir(out) if d.startswith("checkpoint-")]
    assert len(ckpts) == 1
    # ...and the in-step finite-guard kept the weights clean: non-finite
    # updates are skipped, so the serialized params contain no NaN/Inf
    from reflecting_reality_tpu.core.io import load_safetensors

    w = load_safetensors(os.path.join(
        out, ckpts[0], "brushnet", "diffusion_pytorch_model.safetensors"))
    for k, v in w.items():
        assert np.isfinite(np.asarray(v, np.float32)).all(), k


@pytest.mark.integration
def test_steps_per_dispatch_matches_single(env, tmp_path):
    """--steps_per_dispatch K scans K optimizer steps inside one jitted
    dispatch (stacked (K, batch, ...) super-batch, lax.scan carry).  The
    scan body splits the carried rng exactly like the K=1 host loop and the
    dataset RNG is item-keyed (data/rng.py), so the RNG/batch/step stream is
    the same as K=1; numerics match to floating-point tolerance (the scan
    compiles a different XLA program, so fusion differences produce
    ulp-level drift, not exact bits).  An odd max_train_steps also
    exercises the clamped tail program (k < K)."""
    import json

    from reflecting_reality_tpu.cli import train as train_cli
    from reflecting_reality_tpu.core.io import load_safetensors

    base, _ = env
    data = str(tmp_path / "data16")
    make_synmirror_data(data, n=16, size=64)  # 2 global batches per epoch

    def run(tag, extra):
        out = str(tmp_path / tag)
        train_cli.main([
            "--pretrained_model_name_or_path", base,
            "--train_data_dir", data,
            "--output_dir", out,
            "--resolution", "64",
            "--train_batch_size", "1",
            "--max_train_steps", "5",
            "--checkpointing_steps", "100",
            "--learning_rate", "1e-3",
            "--lr_warmup_steps", "0",
            "--depth_conditioning_mode", "concat",
            "--report_to", "none",
            "--logging_dir", os.path.join(out, "logs"),
            "--validation_steps", "0",
            "--seed", "0",
            "--log_every", "1",
        ] + extra)
        with open(os.path.join(out, "logs", "metrics.jsonl")) as f:
            losses = {r["step"]: r["loss"] for r in map(json.loads, f)
                      if "loss" in r}
        ckpt = os.path.join(out, "checkpoint-5", "brushnet",
                            "diffusion_pytorch_model.safetensors")
        return losses, load_safetensors(ckpt)

    l1, w1 = run("k1", [])
    l2, w2 = run("k2", ["--steps_per_dispatch", "2"])
    assert set(l1) == set(l2) == {1, 2, 3, 4, 5}
    for s in sorted(l1):
        np.testing.assert_allclose(l1[s], l2[s], rtol=2e-4,
                                   err_msg=f"loss diverged at step {s}")
    for k in w1:
        # atol 5e-6: after 5 steps the zero-conv weights are ~1e-3-1e-2 and
        # the two XLA programs (host loop vs scan) differ by ulp-level
        # accumulation order — measured max drift 1.2e-6 absolute
        np.testing.assert_allclose(
            np.asarray(w1[k], np.float32), np.asarray(w2[k], np.float32),
            rtol=1e-4, atol=5e-6, err_msg=k)


@pytest.mark.integration
@pytest.mark.medium
def test_async_save_journey(env, tmp_path):
    """--async_save: background checkpoint writes produce the same layout
    and the run's final synchronous save is durable."""
    base, data = env

    from reflecting_reality_tpu.cli import train as train_cli

    out = str(tmp_path / "run_async")
    train_cli.main([
        "--pretrained_model_name_or_path", base,
        "--train_data_dir", data,
        "--output_dir", out,
        "--resolution", "64",
        "--train_batch_size", "1",
        "--max_train_steps", "2",
        "--checkpointing_steps", "1",
        "--learning_rate", "1e-4",
        "--lr_warmup_steps", "0",
        "--depth_conditioning_mode", "concat",
        "--report_to", "none",
        "--logging_dir", os.path.join(out, "logs"),
        "--validation_steps", "0",
        "--seed", "0",
        "--async_save",
    ])
    for step in (1, 2):
        ckpt = os.path.join(out, f"checkpoint-{step}")
        assert os.path.exists(
            os.path.join(ckpt, "brushnet", "diffusion_pytorch_model.safetensors")
        )
        assert os.path.exists(os.path.join(ckpt, "train_state.msgpack"))


@pytest.mark.integration
@pytest.mark.medium
def test_use_ema_inference_journey(env, tmp_path):
    """--use_ema on the tester loads checkpoint-N/ema/brushnet (written by
    train --use_ema) and produces different images than the raw weights."""
    base, data = env

    from reflecting_reality_tpu.cli import test as test_cli
    from reflecting_reality_tpu.cli import train as train_cli

    out = str(tmp_path / "run_ema")
    train_cli.main([
        "--pretrained_model_name_or_path", base,
        "--train_data_dir", data,
        "--output_dir", out,
        "--resolution", "64",
        "--train_batch_size", "1",
        "--max_train_steps", "2",
        "--checkpointing_steps", "2",
        "--learning_rate", "1e-1",  # big LR so raw != EMA visibly
        "--lr_warmup_steps", "0",
        "--depth_conditioning_mode", "concat",
        "--report_to", "none",
        "--logging_dir", os.path.join(out, "logs"),
        "--validation_steps", "0",
        "--seed", "0",
        "--use_ema",
    ])
    ckpt = os.path.join(out, "checkpoint-2")
    assert os.path.isdir(os.path.join(ckpt, "ema", "brushnet"))

    common = [
        "--brushnet_path", ckpt,
        "--base_model_path", base,
        "--train_data_dir", data,
        "--resolution", "64",
        "--num_inference_steps", "2",
        "--num_images_per_validation", "1",
        "--depth_conditioning_mode", "concat",
        "--num_samples", "1",
        "--seed", "0",
    ]
    raw_dir = str(tmp_path / "infer_raw")
    ema_dir = str(tmp_path / "infer_ema")
    test_cli.main(common + ["--output_dir", raw_dir])
    test_cli.main(common + ["--output_dir", ema_dir, "--use_ema"])

    import numpy as np
    from PIL import Image

    raw_png, = os.listdir(raw_dir)
    a = np.asarray(Image.open(os.path.join(raw_dir, raw_png)), np.int16)
    b = np.asarray(Image.open(os.path.join(ema_dir, raw_png)), np.int16)
    assert np.abs(a - b).max() > 0


@pytest.mark.integration
@pytest.mark.medium
def test_device_cache_matches_host_cache(env, tmp_path):
    """--device_cache (device-resident moments, gather-by-index) must log
    the SAME loss stream as the host-cached path: same shuffle order, same
    item-RNG input_ids, same moments — only the transport differs."""
    import json

    from reflecting_reality_tpu.cli import train as train_cli
    from reflecting_reality_tpu.tools import precompute_latents

    base, data = env
    cache = str(tmp_path / "cache")
    precompute_latents.main([
        "--pretrained_model_name_or_path", base,
        "--train_data_dir", data,
        "--output_dir", cache,
        "--resolution", "64",
        "--batch_size", "2",
        "--depth_conditioning_mode", "concat",
    ])

    def run(extra, out):
        train_cli.main([
            "--pretrained_model_name_or_path", base,
            "--train_data_dir", data,
            "--precomputed_latents_dir", cache,
            "--output_dir", str(tmp_path / out),
            "--logging_dir", str(tmp_path / out / "logs"),
            "--report_to", "jsonl",
            "--resolution", "64",
            "--train_batch_size", "1",
            "--max_train_steps", "4",
            "--checkpointing_steps", "100",
            "--learning_rate", "1e-4",
            "--depth_conditioning_mode", "concat",
            "--validation_steps", "0",
            "--log_every", "1",
            "--seed", "0",
        ] + extra)
        rows = [json.loads(l) for l in
                open(tmp_path / out / "logs" / "metrics.jsonl")]
        return [r["loss"] for r in rows if "loss" in r]

    host = run([], "host_cache")
    dev = run(["--device_cache"], "device_cache")
    assert len(host) == 4
    np.testing.assert_allclose(dev, host, rtol=2e-4)
    # K>1 path over the device cache too
    dev_k = run(["--device_cache", "--steps_per_dispatch", "2"], "device_k2")
    np.testing.assert_allclose(dev_k, host, rtol=2e-4)


def test_cli_attention_backend_defaults_flash():
    """Regression (round-5 postmortem): every CLI must default the attention
    backend to 'flash' — the benchmarks always set it, but the CLIs silently
    ran einsum attention, costing the cached-E2E train 30% device rate
    (2.56 vs 3.68 steps/s; caught by benchmarks/analyze_train_trace.py)."""
    from reflecting_reality_tpu.cli import serve, test, train

    for mod in (train, test, serve):
        parser = mod.build_parser()
        assert parser.get_default("attention_backend") == "flash", mod.__name__
