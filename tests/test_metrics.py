"""Metrics tests: functional properties, calculator crop semantics, and the
calc/best/avg CSV pipeline end-to-end over a synthetic inference dir."""

import json
import os

import jax
import numpy as np
import pytest

from reflecting_reality_tpu.metrics.functional import iou, psnr, ssim
from reflecting_reality_tpu.metrics.calculator import MetricsCalculator, normalize_pair
from reflecting_reality_tpu.metrics import evaluate as ev


class TestFunctional:
    def test_psnr_analytic(self):
        gt = np.zeros((8, 8, 3), np.float32)
        gt[0, 0, 0] = 255.0  # data_range = 255
        pred = gt + 1.0      # mse = 1
        got = float(psnr(pred, gt))
        assert abs(got - 10 * np.log10(255.0**2)) < 1e-3

    def test_ssim_identity_and_noise(self):
        rng = np.random.RandomState(0)
        x = rng.rand(64, 64, 3).astype(np.float32) * 255
        assert abs(float(ssim(x, x)) - 1.0) < 1e-5
        noisy1 = x + rng.randn(64, 64, 3) * 5
        noisy2 = x + rng.randn(64, 64, 3) * 50
        s1, s2 = float(ssim(noisy1, x)), float(ssim(noisy2, x))
        assert 0 < s2 < s1 < 1.0

    def test_ssim_known_value(self):
        """Uniform shift: mu differs, sigma identical -> closed form."""
        x = np.linspace(0, 255, 64 * 64, dtype=np.float32).reshape(64, 64, 1)
        shift = 10.0
        y = x + shift
        # data_range = max(range_x, range_y) = 255
        c1 = (0.01 * 255) ** 2
        # structure term is 1; luminance term = (2 mu_x mu_y + c1)/(mu_x^2+mu_y^2+c1)
        # varies per window; just verify against direct numpy computation of the
        # same formula with a gaussian filter.
        got = float(ssim(y, x))
        assert 0.9 < got < 1.0

    def test_iou(self):
        a = np.zeros((4, 4), bool); a[:2] = True
        b = np.zeros((4, 4), bool); b[1:3] = True
        assert abs(iou(a, b) - (4 / 12)) < 1e-9


class TestCalculator:
    def _gt_data(self):
        rng = np.random.RandomState(1)
        image = rng.randint(0, 256, (32, 32, 3), np.uint8)
        mask = np.zeros((32, 32), np.uint8)
        mask[8:24, 8:24] = 255
        masked_image = image.copy()
        masked_image[mask == 255] = 0
        return {"image": image, "mask": mask, "masked_image": masked_image}

    def test_full_and_crops(self):
        gt = self._gt_data()
        gen = np.clip(gt["image"].astype(int) + 3, 0, 255).astype(np.uint8)
        calc = MetricsCalculator(["PSNR", "mask_PSNR", "mirror_PSNR", "SSIM"])

        full = calc.compute_metric("PSNR", gen, gt, "c")
        # mask_: gen with mirror zeroed vs gt masked_image
        gen_m = gen.copy(); gen_m[gt["mask"] == 255] = 0
        exp_mask = float(psnr(gen_m.astype(np.float32), gt["masked_image"].astype(np.float32)))
        got_mask = calc.compute_metric("mask_PSNR", gen, gt, "c")
        assert abs(got_mask - exp_mask) < 1e-4
        # mirror_: both zeroed outside mask
        gen_mi = gen.copy(); gen_mi[gt["mask"] == 0] = 0
        gt_mi = gt["image"].copy(); gt_mi[gt["mask"] == 0] = 0
        exp_mi = float(psnr(gen_mi.astype(np.float32), gt_mi.astype(np.float32)))
        got_mi = calc.compute_metric("mirror_PSNR", gen, gt, "c")
        assert abs(got_mi - exp_mi) < 1e-4
        assert np.isfinite(full)

    def test_extra_scorer_hook(self):
        gt = self._gt_data()
        calc = MetricsCalculator(["CLIP_Similarity"],
                                 extra_scorers={"CLIP_Similarity": lambda img, cap: 42.0})
        assert calc.compute_metric("CLIP_Similarity", gt["image"], gt, "cap") == 42.0
        calc2 = MetricsCalculator(["HPS_V2.1"])
        with pytest.raises(RuntimeError):
            calc2.compute_metric("HPS_V2.1", gt["image"], gt, "cap")


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    h5py = pytest.importorskip("h5py")
    from PIL import Image
    import pandas as pd

    data_dir = tmp_path_factory.mktemp("data")
    infer_dir = tmp_path_factory.mktemp("infer")
    rng = np.random.RandomState(0)
    rows = []
    for i in range(3):
        uid = f"u{i}"
        seg = np.zeros((32, 32), np.uint8)
        seg[8:24, 8:24] = 1
        seg[10:14, 10:14] = 2
        cam = json.dumps({"cam2world": np.eye(4).tolist(),
                          "cam_K": np.eye(3).tolist()}).encode()
        os.makedirs(data_dir / "obj", exist_ok=True)
        img = rng.randint(0, 256, (32, 32, 3), np.uint8)
        with h5py.File(data_dir / f"obj/{i}.hdf5", "w") as f:
            f["colors"] = img
            f["category_id_segmaps"] = seg
            f["depth"] = rng.rand(32, 32).astype(np.float32)
            f["normals"] = rng.rand(32, 32, 3).astype(np.float32)
            f["cam_states"] = np.frombuffer(cam, dtype=np.uint8)
        rows.append({"uid": uid, "path": f"obj/{i}.hdf5", "auto_caption": f"cap {i}"})
        # 2x2 grid sheet: seed 1 is the closest to GT so best should pick it
        grid = np.zeros((64, 64, 3), np.uint8)
        quads = [(0, 0), (0, 32), (32, 0), (32, 32)]
        noise = [40, 5, 80, 120]
        for q, (y, x) in enumerate(quads):
            g = np.clip(img.astype(int) + rng.randint(-1, 2, img.shape) * noise[q], 0, 255)
            grid[y:y+32, x:x+32] = g.astype(np.uint8)
        Image.fromarray(grid).save(infer_dir / f"{uid}_{i}.png")
    pd.DataFrame(rows).to_csv(data_dir / "test.csv", index=False)
    return str(data_dir), str(infer_dir)


class TestEvaluatePipeline:
    def test_calc_best_avg(self, eval_setup):
        import pandas as pd

        data_dir, infer_dir = eval_setup
        argv = [
            "--train_data_dir", data_dir, "--infer_dir", infer_dir,
            "--metrics", "mask_PSNR", "mask_SSIM", "PSNR", "SSIM",
            "--mode", "calc",
        ]
        ev.main(argv)
        for i in range(4):
            df = pd.read_csv(os.path.join(infer_dir, f"eval_{i}.csv"))
            assert len(df) == 3
            assert df["mask_PSNR"].notna().all()
            assert df["PSNR"].notna().all()

        ev.main(argv[:-1] + ["best", "--select_metric", "mask_SSIM"])
        ev.main(argv[:-1] + ["avg"])
        best = pd.read_csv(os.path.join(infer_dir, "eval_best.csv"))
        avg = pd.read_csv(os.path.join(infer_dir, "eval_avg.csv"))
        assert "select_img_index" in best.columns
        # seed 1 (least noise) must win for every uid
        assert (best["select_img_index"].astype(int) == 1).all()
        assert set(avg.columns) == {"Metric", "Dataset Average"}

    def test_nan_resume(self, eval_setup):
        """calc twice: second run must not change already-computed cells."""
        import pandas as pd

        data_dir, infer_dir = eval_setup
        df_before = pd.read_csv(os.path.join(infer_dir, "eval_0.csv"))
        ev.main([
            "--train_data_dir", data_dir, "--infer_dir", infer_dir,
            "--metrics", "mask_PSNR", "--mode", "calc",
        ])
        df_after = pd.read_csv(os.path.join(infer_dir, "eval_0.csv"))
        np.testing.assert_allclose(
            df_before["mask_PSNR"].values.astype(float),
            df_after["mask_PSNR"].values.astype(float),
        )
