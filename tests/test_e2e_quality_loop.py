"""Mini-SynMirror end-to-end quality loop (VERDICT round-1 item 2).

The full reference journey on a generated-but-faithful SynMirror shard at
128x128: train -> checkpoint -> inference grids -> metrics calc -> best ->
avg — and then every metric CSV cell is independently re-derived with the
reference protocol (torchmetrics-1.4 functional math as numpy, reference
crop semantics) straight from the images on disk.

Reference protocol: metrics/evaluate_metrics.py:292-460 (calc/best/avg,
2x2 grid splitting, per-seed CSVs, best-of-4 by mask_SSIM),
metrics/metrics.py:139-145 (mask_*/mirror_* crops), :196-209 (torchmetrics
functional PSNR/SSIM).
"""

import os

import numpy as np
import pytest

from tests.test_metrics import _np_psnr, _np_ssim
from tests.tiny_checkpoint import make_synmirror_data, make_tiny_sd_checkpoint

RES = 128
SEEDS = 4
METRICS = ["full", "mask", "mirror"]
COLS = ["PSNR", "LPIPS", "SSIM", "mask_PSNR", "mask_LPIPS", "mask_SSIM",
        "mirror_PSNR", "mirror_LPIPS", "mirror_SSIM"]


@pytest.fixture(scope="module")
def loop_env(tmp_path_factory):
    pytest.importorskip("h5py")
    import pandas as pd  # noqa: F401

    base = tmp_path_factory.mktemp("sd_tiny_q")
    data = tmp_path_factory.mktemp("data_q")
    run = tmp_path_factory.mktemp("run_q")
    make_tiny_sd_checkpoint(str(base))
    make_synmirror_data(str(data), n=8, size=RES)

    from reflecting_reality_tpu.cli import train as train_cli

    train_cli.main([
        "--pretrained_model_name_or_path", str(base),
        "--train_data_dir", str(data),
        "--output_dir", str(run),
        "--resolution", str(RES),
        "--train_batch_size", "1",
        "--max_train_steps", "2",
        "--checkpointing_steps", "2",
        "--learning_rate", "1e-4",
        "--lr_warmup_steps", "0",
        "--depth_conditioning_mode", "concat",
        "--report_to", "none",
        "--logging_dir", os.path.join(str(run), "logs"),
        "--validation_steps", "0",
        "--seed", "0",
    ])
    ckpt = os.path.join(str(run), "checkpoint-2")
    assert os.path.isdir(ckpt)

    from reflecting_reality_tpu.cli import test as test_cli

    infer = os.path.join(ckpt, "inference")
    test_cli.main([
        "--brushnet_path", ckpt,
        "--base_model_path", str(base),
        "--train_data_dir", str(data),
        "--output_dir", infer,
        "--resolution", str(RES),
        "--num_inference_steps", "2",
        "--num_images_per_validation", str(SEEDS),
        "--depth_conditioning_mode", "concat",
        "--seed", "0",
    ])
    assert len([f for f in os.listdir(infer) if f.endswith(".png")]) == 8

    # hermetic LPIPS weights (tiny random; value correctness pinned elsewhere)
    import jax
    import jax.numpy as jnp

    from reflecting_reality_tpu.metrics.lpips import LPIPS, save_lpips_npz

    module = LPIPS()
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    params = jax.tree_util.tree_map(lambda x: np.abs(np.asarray(x)), params)
    lpips_npz = os.path.join(str(run), "lpips.npz")
    save_lpips_npz(params, lpips_npz)

    from reflecting_reality_tpu.metrics import evaluate as eval_cli

    common = [
        "--train_data_dir", str(data),
        "--csv", "test.csv",
        "--infer_dir", infer,
        "--resolution", str(RES),
        "--num_images_per_validation", str(SEEDS),
        "--lpips_weights", lpips_npz,
    ]
    eval_cli.main(common + ["--mode", "calc", "--metrics"] + METRICS)
    eval_cli.main(common + ["--mode", "best", "--select_metric", "mask_SSIM",
                            "--metrics"] + METRICS)
    eval_cli.main(common + ["--mode", "avg"])
    return str(base), str(data), infer, lpips_npz


def _gt_for(data_dir, path):
    import h5py

    from reflecting_reality_tpu.data.synmirror import extract_data_from_hdf5

    with h5py.File(os.path.join(data_dir, path), "r") as f:
        return extract_data_from_hdf5(f)


def _split(infer_dir, uid_png, n):
    from PIL import Image

    from reflecting_reality_tpu.metrics.evaluate import split_generated_image

    return [np.array(s) for s in
            split_generated_image(n, Image.open(os.path.join(infer_dir, uid_png)))]


def _reference_cell(metric, gen, gt_data, lpips_fn):
    """The reference protocol, re-derived independently: crop semantics from
    metrics.py:139-145, torchmetrics-1.4 functional math from :196-209."""
    from reflecting_reality_tpu.data.synmirror import get_masked_image

    gt_img, gen_img = gt_data["image"], gen
    if metric.startswith("mask"):
        gt_img = gt_data["masked_image"]
        gen_img = get_masked_image(gen, gt_data["mask"])
    elif metric.startswith("mirror"):
        gt_img = get_masked_image(gt_data["image"], gt_data["mask"], invert=False)
        gen_img = get_masked_image(gen, gt_data["mask"], invert=False)
    p = np.asarray(gen_img, np.float64)
    t = np.asarray(gt_img, np.float64)
    if "PSNR" in metric:
        return _np_psnr(p, t)
    if "SSIM" in metric:
        return _np_ssim(p, t)
    return lpips_fn(p / 127.5 - 1.0, t / 127.5 - 1.0)


class TestQualityLoopCSVs:
    @pytest.mark.medium
    def test_calc_cells_match_reference_protocol(self, loop_env):
        import pandas as pd

        from reflecting_reality_tpu.metrics.lpips import LPIPS, load_lpips_npz

        base, data, infer, lpips_npz = loop_env
        lpips_params = load_lpips_npz(lpips_npz)
        lpips_mod = LPIPS()

        def lpips_fn(a, b):
            import jax.numpy as jnp

            return float(lpips_mod.apply(
                lpips_params, jnp.asarray(a, jnp.float32)[None],
                jnp.asarray(b, jnp.float32)[None]))

        test_df = pd.read_csv(os.path.join(data, "test.csv"))
        checked = 0
        for i in range(SEEDS):
            df = pd.read_csv(os.path.join(infer, f"eval_{i}.csv")).set_index("uid")
            for _, row in test_df.iterrows():
                stem = os.path.split(str(row["path"]))[1].split(".")[0]
                uid = f"{row['uid']}_{stem}"
                gt = _gt_for(data, str(row["path"]))
                gen = _split(infer, f"{uid}.png", SEEDS)[i]
                for m in COLS:
                    want = _reference_cell(m, gen, gt, lpips_fn)
                    got = float(df.at[uid, m])
                    rtol = 1e-3 if "LPIPS" not in m else 5e-3
                    np.testing.assert_allclose(got, want, rtol=rtol, atol=1e-4,
                                               err_msg=f"{uid} seed{i} {m}")
                    checked += 1
        assert checked == 8 * SEEDS * len(COLS)

    def test_best_selection_and_rows(self, loop_env):
        import pandas as pd

        _, _, infer, _ = loop_env
        dfs = [pd.read_csv(os.path.join(infer, f"eval_{i}.csv"))
               for i in range(SEEDS)]
        best = pd.read_csv(os.path.join(infer, "eval_best.csv"))
        assert len(best) == 8
        for ridx, row in best.iterrows():
            vals = [df.at[ridx, "mask_SSIM"] for df in dfs]
            j = int(np.argmax(vals))
            assert int(row["select_img_index"]) == j
            for m in COLS:
                np.testing.assert_allclose(row[m], dfs[j].at[ridx, m],
                                           rtol=1e-9, err_msg=m)

    def test_avg_is_mean_of_best(self, loop_env):
        import pandas as pd

        from reflecting_reality_tpu.metrics.evaluate import all_metrics

        _, _, infer, _ = loop_env
        best = pd.read_csv(os.path.join(infer, "eval_best.csv"))
        avg = pd.read_csv(os.path.join(infer, "eval_avg.csv")).set_index("Metric")
        filled = best.reindex(columns=all_metrics, fill_value=0).astype(float)
        for m in COLS:
            np.testing.assert_allclose(
                float(avg.at[m, "Dataset Average"]), float(filled[m].mean()),
                rtol=1e-9, err_msg=m)

    def test_nan_resume_fills_only_missing(self, loop_env):
        import pandas as pd

        base, data, infer, lpips_npz = loop_env
        csv0 = os.path.join(infer, "eval_0.csv")
        df = pd.read_csv(csv0)
        poke_uid = df.at[3, "uid"]
        orig = df.at[3, "PSNR"]
        df.at[3, "PSNR"] = float("nan")
        df.to_csv(csv0, index=False)

        from reflecting_reality_tpu.metrics import evaluate as eval_cli

        eval_cli.main([
            "--train_data_dir", data, "--csv", "test.csv",
            "--infer_dir", infer, "--resolution", str(RES),
            "--num_images_per_validation", str(SEEDS),
            "--lpips_weights", lpips_npz,
            "--mode", "calc", "--metrics", "PSNR",
        ])
        df2 = pd.read_csv(csv0).set_index("uid")
        np.testing.assert_allclose(df2.at[poke_uid, "PSNR"], orig, rtol=1e-6)
