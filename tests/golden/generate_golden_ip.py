"""Generate golden outputs for the IP-Adapter (normals) training forward.

Reproduces the reference MirrorFusionModel.forward in ip_adapter mode
(train_brushnet_mirror.py:858-888 + the processor wiring at :1085-1123):
tiny torch UNet with IPAttnProcessor2_0 on every cross-attention
(num_tokens=4 quirk), FreqEncoder(3->192) + NormalProjModel(192->cad),
brushnet on PLAIN text tokens, unet on cat([text, normal_token]).

Stores weights + inputs + the noise prediction as npz; the pytest side loads
the same weights into the flax UNet (ip_num_tokens=4) and compares.

Run once: python tests/golden/generate_golden_ip.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference/MirrorFusion/src")
sys.path.insert(0, "/root/reference/MirrorFusion/examples/brushnet")

import torch  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "ip_adapter.npz")

TINY = dict(
    block_out_channels=(8, 16, 16, 16),
    attention_head_dim=2,
    cross_attention_dim=16,
    norm_num_groups=4,
    layers_per_block=2,
)


@torch.no_grad()
def main():
    from diffusers import BrushNetModel, UNet2DConditionModel
    from ip_adapter.attention_processor import AttnProcessor2_0, IPAttnProcessor2_0
    from ip_adapter.ip_adapter import FreqEncoder, NormalProjModel

    torch.manual_seed(0)
    unet = UNet2DConditionModel(sample_size=16, **TINY)
    brushnet = BrushNetModel.from_unet(unet, conditioning_channels=6)
    for name, p in brushnet.named_parameters():
        if "brushnet_" in name or "conv_in_condition" in name:
            p.copy_(torch.randn_like(p) * 0.05)

    cad = unet.config.cross_attention_dim
    freq_encoder = FreqEncoder(
        input_dim=3, max_freq_log2=5, N_freqs=32, log_sampling=True,
        include_input=False, periodic_fns=(torch.sin, torch.cos),
    )
    normal_proj = NormalProjModel(cross_attention_dim=cad, normals_embeddings_dim=192)

    # processor wiring verbatim (train_brushnet_mirror.py:1099-1123), then
    # randomize to_k_ip/to_v_ip so parity isn't trivially the to_k/to_v copy
    attn_procs = {}
    unet_sd = unet.state_dict()
    for name in unet.attn_processors.keys():
        cross_attention_dim = None if name.endswith("attn1.processor") else cad
        if name.startswith("mid_block"):
            hidden_size = unet.config.block_out_channels[-1]
        elif name.startswith("up_blocks"):
            block_id = int(name[len("up_blocks.")])
            hidden_size = list(reversed(unet.config.block_out_channels))[block_id]
        elif name.startswith("down_blocks"):
            block_id = int(name[len("down_blocks.")])
            hidden_size = unet.config.block_out_channels[block_id]
        if cross_attention_dim is None:
            attn_procs[name] = AttnProcessor2_0()
        else:
            layer_name = name.split(".processor")[0]
            weights = {
                "to_k_ip.weight": unet_sd[layer_name + ".to_k.weight"],
                "to_v_ip.weight": unet_sd[layer_name + ".to_v.weight"],
            }
            proc = IPAttnProcessor2_0(hidden_size=hidden_size,
                                      cross_attention_dim=cross_attention_dim)
            proc.load_state_dict(weights)
            proc.to_k_ip.weight.copy_(torch.randn_like(proc.to_k_ip.weight) * 0.2)
            proc.to_v_ip.weight.copy_(torch.randn_like(proc.to_v_ip.weight) * 0.2)
            attn_procs[name] = proc
    unet.set_attn_processor(attn_procs)

    rng = np.random.RandomState(1)
    sample = rng.randn(2, 4, 16, 16).astype(np.float32)   # NCHW
    t = np.array([7, 423], np.int64)
    ehs = rng.randn(2, 11, cad).astype(np.float32)        # plain text tokens
    cond = rng.randn(2, 6, 16, 16).astype(np.float32)
    normal = rng.randn(2, 1, 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)

    unet.eval(); brushnet.eval(); normal_proj.eval()

    # MirrorFusionModel.forward (:858-888)
    down, mid, up = brushnet(
        torch.tensor(sample), torch.tensor(t),
        encoder_hidden_states=torch.tensor(ehs),
        brushnet_cond=torch.tensor(cond),
        return_dict=False,
    )
    normal_embeds = freq_encoder(torch.tensor(normal))
    ip_tokens = normal_proj(normal_embeds)
    unet_ehs = torch.cat([torch.tensor(ehs), ip_tokens], dim=1)
    pred = unet(
        torch.tensor(sample), torch.tensor(t),
        encoder_hidden_states=unet_ehs,
        down_block_add_samples=[d.clone() for d in down],
        mid_block_add_sample=mid.clone(),
        up_block_add_samples=[u.clone() for u in up],
        return_dict=False,
    )[0]

    out = {
        "sample": sample, "t": t, "ehs": ehs, "cond": cond, "normal": normal,
        "ip_tokens": ip_tokens.numpy(),
        "pred": pred.numpy(),
    }
    out.update({f"unet::{k}": v.detach().numpy() for k, v in unet.state_dict().items()})
    out.update({f"brushnet::{k}": v.detach().numpy() for k, v in brushnet.state_dict().items()})
    out.update({f"proj::{k}": v.detach().numpy() for k, v in normal_proj.state_dict().items()})
    np.savez_compressed(OUT, **out)
    print("wrote", OUT, f"({len(out)} arrays)")


if __name__ == "__main__":
    main()
