"""One-time LPIPS(squeeze) weights converter: torch checkpoint -> hermetic .npz.

The reference computes LPIPS through torchmetrics
(reference: metrics/metrics.py:196-209), which torch-loads the
richzhang/PerceptualSimilarity squeeze weights at runtime.  A TPU image must
not need torch, so this CLI runs ONCE wherever torch exists and converts the
checkpoint into the numpy-only .npz format that
metrics.calculator.MetricsCalculator loads directly
(metrics/lpips.py:save_lpips_npz).

Sources, tried in order:
  --torch_ckpt PATH      an lpips/torchmetrics squeeze state_dict (.pt/.pth)
  --from_torchmetrics    instantiate torchmetrics' LPIPS(net_type="squeeze")
                         and dump its state dict (downloads weights if the
                         environment allows)

Usage:
    python -m reflecting_reality_tpu.tools.convert_lpips \
        --torch_ckpt lpips_squeeze.pth --out lpips_squeeze.npz
"""

from __future__ import annotations

import argparse


def state_from_torch_ckpt(path: str) -> dict:
    import torch

    state = torch.load(path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.numpy() for k, v in state.items()}


def state_from_torchmetrics() -> dict:
    from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity

    metric = LearnedPerceptualImagePatchSimilarity(net_type="squeeze")
    return {k: v.numpy() for k, v in metric.net.state_dict().items()}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_ckpt", type=str, default=None)
    p.add_argument("--from_torchmetrics", action="store_true")
    p.add_argument("--out", type=str, required=True, help=".npz output path")
    args = p.parse_args(argv)

    from reflecting_reality_tpu.metrics.lpips import (
        load_torch_lpips_state, save_lpips_npz,
    )

    if args.torch_ckpt:
        state = state_from_torch_ckpt(args.torch_ckpt)
    elif args.from_torchmetrics:
        state = state_from_torchmetrics()
    else:
        raise SystemExit("need --torch_ckpt or --from_torchmetrics")

    params = load_torch_lpips_state(state)
    save_lpips_npz(params, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
