"""Serving-mode quality pinning (promised by benchmarks/benchmark_mode_quality.py).

Runs the SAME train -> generate-per-mode -> evaluate(calc/best/avg) protocol
as the benchmark (reference: metrics/evaluate_metrics.py:292-460) at
miniature scale, and pins that the approximate serving modes (int8 /
DeepCache / encoder-reuse) stay within quality tolerances of the exact path
on a TRAINED checkpoint — catching both silent mode fallbacks (mode output
identical to exact) and catastrophic degradation (mode output garbage).

Tolerances here are deliberately looser than the full-scale numbers in
benchmarks/PROFILE.md (tiny models amplify approximation error); they bound
"the mode still produces the same scene", not publication deltas.
"""

import os

import numpy as np
import pytest

pytest.importorskip("h5py")
pytest.importorskip("pandas")

from benchmarks.benchmark_mode_quality import run_quality  # noqa: E402

MODES = [
    ("exact", []),
    ("int8", ["--int8", "--int8_all"]),
    ("deepcache_2", ["--deep_cache", "2"]),
    ("encoder_reuse_2", ["--encoder_reuse", "2"]),
]

# |delta vs exact| bounds on the eval_avg dataset averages at tiny scale.
# mask_* is the reference's selection family (best-of-seeds by mask_SSIM).
TOLS = {
    "int8": {"mask_SSIM": 0.10, "mask_PSNR": 4.0},
    "deepcache_2": {"mask_SSIM": 0.15, "mask_PSNR": 6.0},
    "encoder_reuse_2": {"mask_SSIM": 0.15, "mask_PSNR": 6.0},
}


@pytest.fixture(scope="module")
def quality(tmp_path_factory):
    work = str(tmp_path_factory.mktemp("mode_quality"))
    # train_batch_size=1: under the 8-virtual-device test mesh the global
    # batch is 8, matching the 8-sample shard
    return run_quality(work, train_steps=30, resolution=64, n_samples=8,
                       steps=8, seeds=4, modes=MODES, lr="1e-3",
                       train_batch_size=1), work


@pytest.mark.medium
@pytest.mark.integration
class TestModeQuality:
    def test_exact_produces_finite_metrics(self, quality):
        results, _ = quality
        for col, val in results["exact"].items():
            assert np.isfinite(val), col
        # PSNR of a real generation against GT is in a sane range (not
        # a black/constant image, which lands near 5-10 dB at tiny scale)
        assert results["exact"]["mask_PSNR"] > 10.0

    @pytest.mark.parametrize("mode", [m for m, _ in MODES if m != "exact"])
    def test_mode_within_tolerance_of_exact(self, quality, mode):
        results, _ = quality
        exact = results["exact"]
        vals = results[mode]
        for col, tol in TOLS[mode].items():
            delta = vals[col] - exact[col]
            assert abs(delta) <= tol, (
                f"{mode} {col} delta {delta:+.4f} exceeds ±{tol} "
                f"(exact={exact[col]:.4f}, {mode}={vals[col]:.4f})")

    @pytest.mark.parametrize("mode", [m for m, _ in MODES if m != "exact"])
    def test_mode_actually_differs_from_exact(self, quality, mode):
        """An approximate mode whose pixels are bit-identical to exact means
        the mode flag silently fell back to the exact path."""
        from PIL import Image

        _, work = quality
        run = os.path.join(work, "run")
        exact_dir = os.path.join(run, "inference_exact")
        mode_dir = os.path.join(run, f"inference_{mode}")
        pngs = sorted(f for f in os.listdir(exact_dir) if f.endswith(".png"))
        assert pngs
        any_diff = False
        for f in pngs:
            a = np.asarray(Image.open(os.path.join(exact_dir, f)))
            b = np.asarray(Image.open(os.path.join(mode_dir, f)))
            if not np.array_equal(a, b):
                any_diff = True
                break
        assert any_diff, f"{mode} output bit-identical to exact"
