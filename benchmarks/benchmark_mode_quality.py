"""Serving-mode quality through the REAL eval protocol (VERDICT r2 item 4).

The round-2 fast-mode quality numbers were latent-PSNR on random weights;
this benchmark replaces them with the reference metrics protocol
(evaluate_metrics.py:292-460 — calc per seed, best-of-4 by mask_SSIM, avg)
run on a TRAINED checkpoint:

  1. train the tiny config several hundred overfit steps on a mini-SynMirror
     shard (same recipe as tests/test_training.py::TestLearning — zero-conv
     init means step 0 equals base SD, so the trained model generates
     meaningfully structured mirror content);
  2. generate the full test split with cli/test.py once per serving mode
     (exact / int8 / DeepCache-2,3 / encoder-reuse-2,3), 4 seeds each;
  3. run metrics/evaluate.py calc+best+avg per mode and tabulate
     mask_PSNR / mask_SSIM / mask_LPIPS deltas vs the exact path.

LPIPS uses the hermetic random-init weights (no VGG in the image): a fixed
random conv feature distance — consistent across modes, so *deltas* are
meaningful even though absolute values are not comparable to published
LPIPS.  PSNR/SSIM are the torchmetrics-1.4 semantics (pinned elsewhere).

Appends one row per mode to results.csv; tolerances measured here are
pinned by tests/test_mode_quality.py.

Usage: python benchmarks/benchmark_mode_quality.py [--workdir D]
           [--train_steps 400] [--resolution 128] [--steps 50] [--seeds 4]
"""

import argparse
import csv
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from reflecting_reality_tpu.core.jit_cache import enable_default_compilation_cache

enable_default_compilation_cache()

MODES = [
    ("exact", []),
    ("int8", ["--int8", "--int8_all"]),
    ("deepcache_2", ["--deep_cache", "2"]),
    ("deepcache_3", ["--deep_cache", "3"]),
    ("encoder_reuse_2", ["--encoder_reuse", "2"]),
    ("encoder_reuse_3", ["--encoder_reuse", "3"]),
]
COLS = ["mask_PSNR", "mask_SSIM", "mask_LPIPS", "PSNR", "SSIM", "LPIPS"]


def make_lpips_npz(path):
    import jax
    import jax.numpy as jnp

    from reflecting_reality_tpu.metrics.lpips import LPIPS, save_lpips_npz

    module = LPIPS()
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    params = jax.tree_util.tree_map(lambda x: np.abs(np.asarray(x)), params)
    save_lpips_npz(params, path)


def run_quality(workdir, train_steps=400, resolution=128, n_samples=8,
                steps=50, seeds=4, modes=None, fresh=False, lr="1e-3",
                train_batch_size=4):
    """Train once, then generate + evaluate per mode.  Returns
    {mode: {col: dataset_average}} from each mode's eval_avg.csv."""
    import pandas as pd

    from tests.tiny_checkpoint import make_synmirror_data, make_tiny_sd_checkpoint

    if fresh and os.path.isdir(workdir):
        shutil.rmtree(workdir)
    base = os.path.join(workdir, "sd_tiny")
    data = os.path.join(workdir, "data")
    run = os.path.join(workdir, "run")
    ckpt = os.path.join(run, f"checkpoint-{train_steps}")

    if not os.path.isdir(ckpt):
        os.makedirs(workdir, exist_ok=True)
        make_tiny_sd_checkpoint(base)
        make_synmirror_data(data, n=n_samples, size=resolution)

        from reflecting_reality_tpu.cli import train as train_cli

        train_cli.main([
            "--pretrained_model_name_or_path", base,
            "--train_data_dir", data,
            "--output_dir", run,
            "--resolution", str(resolution),
            "--train_batch_size", str(train_batch_size),
            "--max_train_steps", str(train_steps),
            "--checkpointing_steps", str(train_steps),
            "--learning_rate", lr,
            "--lr_scheduler", "constant",
            "--lr_warmup_steps", "0",
            "--depth_conditioning_mode", "concat",
            "--report_to", "none",
            "--logging_dir", os.path.join(run, "logs"),
            "--validation_steps", "0",
            "--seed", "0",
        ])
    assert os.path.isdir(ckpt), ckpt

    lpips_npz = os.path.join(workdir, "lpips.npz")
    if not os.path.isfile(lpips_npz):
        make_lpips_npz(lpips_npz)

    from reflecting_reality_tpu.cli import test as test_cli
    from reflecting_reality_tpu.metrics import evaluate as eval_cli

    results = {}
    for mode, flags in (modes or MODES):
        infer = os.path.join(run, f"inference_{mode}")
        if not os.path.isfile(os.path.join(infer, "eval_avg.csv")):
            test_cli.main([
                "--brushnet_path", ckpt,
                "--base_model_path", base,
                "--train_data_dir", data,
                "--output_dir", infer,
                "--resolution", str(resolution),
                "--num_inference_steps", str(steps),
                "--num_images_per_validation", str(seeds),
                "--depth_conditioning_mode", "concat",
                "--seed", "0",
            ] + flags)
            common = [
                "--train_data_dir", data,
                "--csv", "test.csv",
                "--infer_dir", infer,
                "--resolution", str(resolution),
                "--num_images_per_validation", str(seeds),
                "--lpips_weights", lpips_npz,
            ]
            eval_cli.main(common + ["--mode", "calc",
                                    "--metrics", "full", "mask"])
            eval_cli.main(common + ["--mode", "best",
                                    "--select_metric", "mask_SSIM",
                                    "--metrics", "full", "mask"])
            eval_cli.main(common + ["--mode", "avg"])
        avg = pd.read_csv(os.path.join(infer, "eval_avg.csv")).set_index("Metric")
        results[mode] = {c: float(avg.at[c, "Dataset Average"]) for c in COLS}
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/rr_mode_quality")
    p.add_argument("--train_steps", type=int, default=400)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--n_samples", type=int, default=8)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seeds", type=int, default=4)
    p.add_argument("--fresh", action="store_true",
                   help="wipe the workdir instead of reusing ckpt/evals")
    args = p.parse_args(argv)

    results = run_quality(args.workdir, args.train_steps, args.resolution,
                          args.n_samples, args.steps, args.seeds,
                          fresh=args.fresh)

    exact = results["exact"]
    print(f"\n{'mode':<18}" + "".join(f"{c:>12}" for c in COLS))
    for mode, vals in results.items():
        print(f"{mode:<18}" + "".join(f"{vals[c]:>12.4f}" for c in COLS))
    print(f"\ndeltas vs exact ({'+'} = better for PSNR/SSIM, lower LPIPS better)")
    for mode, vals in results.items():
        if mode == "exact":
            continue
        d = {c: vals[c] - exact[c] for c in COLS}
        print(f"{mode:<18}" + "".join(f"{d[c]:>+12.4f}" for c in COLS))

    out = os.path.join(REPO, "benchmarks", "results.csv")
    with open(out, "a", newline="") as f:
        w = csv.writer(f)
        for mode, vals in results.items():
            w.writerow([
                f"quality_{mode}", args.resolution, 1, "bf16", "", "",
                f"trained tiny ckpt {args.train_steps} steps; "
                f"mask_PSNR={vals['mask_PSNR']:.3f} "
                f"mask_SSIM={vals['mask_SSIM']:.4f} "
                f"mask_LPIPS={vals['mask_LPIPS']:.4f} "
                f"({args.steps} steps, best-of-{args.seeds})",
            ])
    print(json.dumps({"workdir": args.workdir, "results": results}))


if __name__ == "__main__":
    main()
