"""Generate golden model-forward outputs from the reference implementation.

Builds tiny-config torch models from the read-only reference fork
(/root/reference/MirrorFusion/src/diffusers), runs:
  1. BrushNetModel.forward -> the 12+1+15 scaled residuals
  2. UNet2DConditionModel.forward with those residuals injected
  3. AutoencoderKL encode(mode)/decode round trip
and stores weights (torch state dicts), inputs, and outputs as npz.
tests/test_golden_models.py loads the same weights through
core.io.torch_to_flax_params into our NHWC flax models and compares.

Run once: python tests/golden/generate_golden_models.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference/MirrorFusion/src")

import torch  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "models.npz")

TINY = dict(
    block_out_channels=(8, 16, 16, 16),
    attention_head_dim=2,
    cross_attention_dim=16,
    norm_num_groups=4,
    layers_per_block=2,
)


def state_to_np(module, prefix):
    return {f"{prefix}::{k}": v.detach().numpy() for k, v in module.state_dict().items()}


@torch.no_grad()
def main():
    from diffusers import AutoencoderKL, BrushNetModel, UNet2DConditionModel

    torch.manual_seed(0)
    unet = UNet2DConditionModel(sample_size=16, **TINY)
    brushnet = BrushNetModel.from_unet(unet, conditioning_channels=6)
    # randomize the zero convs + conv_in_condition so the parity test isn't
    # trivially comparing zeros
    for name, p in brushnet.named_parameters():
        if "brushnet_" in name or "conv_in_condition" in name:
            p.copy_(torch.randn_like(p) * 0.05)

    vae = AutoencoderKL(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 8, 8, 8), norm_num_groups=4,
        layers_per_block=1,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
    )

    rng = np.random.RandomState(0)
    sample = rng.randn(2, 4, 16, 16).astype(np.float32)      # NCHW
    t = np.array([7, 423], np.int64)
    ehs = rng.randn(2, 11, 16).astype(np.float32)
    cond = rng.randn(2, 6, 16, 16).astype(np.float32)
    img = rng.randn(1, 3, 32, 32).astype(np.float32)

    unet.eval(); brushnet.eval(); vae.eval()

    down, mid, up = brushnet(
        torch.tensor(sample), torch.tensor(t),
        encoder_hidden_states=torch.tensor(ehs),
        brushnet_cond=torch.tensor(cond),
        conditioning_scale=0.8,
        return_dict=False,
    )
    unet_out = unet(
        torch.tensor(sample), torch.tensor(t),
        encoder_hidden_states=torch.tensor(ehs),
        down_block_add_samples=[d.clone() for d in down],
        mid_block_add_sample=mid.clone(),
        up_block_add_samples=[u.clone() for u in up],
        return_dict=False,
    )[0]
    unet_plain = unet(
        torch.tensor(sample), torch.tensor(t),
        encoder_hidden_states=torch.tensor(ehs),
        return_dict=False,
    )[0]

    posterior = vae.encode(torch.tensor(img)).latent_dist
    z_mode = posterior.mode()
    decoded = vae.decode(z_mode).sample

    out = {
        "sample": sample, "t": t, "ehs": ehs, "cond": cond, "img": img,
        "brushnet_mid": mid.numpy(),
        "unet_out": unet_out.numpy(),
        "unet_plain": unet_plain.numpy(),
        "vae_mode": z_mode.numpy(),
        "vae_decoded": decoded.numpy(),
        "n_down": np.int32(len(down)), "n_up": np.int32(len(up)),
    }
    for i, d in enumerate(down):
        out[f"brushnet_down_{i}"] = d.numpy()
    for i, u in enumerate(up):
        out[f"brushnet_up_{i}"] = u.numpy()
    out.update(state_to_np(unet, "unet"))
    out.update(state_to_np(brushnet, "brushnet"))
    out.update(state_to_np(vae, "vae"))
    np.savez_compressed(OUT, **out)
    print("wrote", OUT, f"({len(out)} arrays)")


if __name__ == "__main__":
    main()
