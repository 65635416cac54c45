"""Attention for the SD-1.5 UNet and VAE.

Replaces the reference's processor zoo (reference:
src/diffusers/models/attention_processor.py:40,732,1204 — AttnProcessor /
AttnProcessor2_0 / xformers) with a single module and a backend switch:

- "xla":    jnp einsum attention; XLA fuses QK^T -> softmax -> V on the MXU.
            Softmax accumulates in fp32 (matches SDPA numerics).
- "flash":  Pallas blockwise flash attention (ops/pallas/flash_attention.py)
            for long self-attention sequences (4096 tokens at 512², 16384 at
            1024²).

Param naming mirrors torch: to_q/to_k/to_v (no bias), to_out.0 (bias), and an
optional group_norm (VAE mid-block attention).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from reflecting_reality_tpu.ops.norms import GroupNorm

_ATTENTION_BACKEND = "xla"


def set_attention_backend(name: str) -> None:
    global _ATTENTION_BACKEND
    assert name in ("xla", "flash")
    _ATTENTION_BACKEND = name


def get_attention_backend() -> str:
    return _ATTENTION_BACKEND


def dot_product_attention(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, H, D)
    v: jnp.ndarray,  # (B, Tk, H, D)
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over (batch, tokens, heads, head_dim)."""
    backend = backend or _ATTENTION_BACKEND
    # Measured crossover on v5e, bf16, CFG batch 2 (benchmarks/
    # benchmark_attention_crossover.py, two-point chained-loop timing):
    #   T=16384 D=40 : flash 8.23 ms, XLA OOM (16 GB logits) -> flash mandatory
    #   T= 4096 D=40 : flash 1.04 ms vs XLA 2.78 ms          -> flash 2.7x
    #   T= 1024 D=80 : flash 0.076 ms vs XLA 0.060 ms        -> XLA wins
    #   T=  256 D=160: flash 0.023 ms vs XLA 0.004 ms        -> XLA wins
    # Below 2048 tokens the head-dim padding (80/160 -> 128/256 lanes) and
    # kernel launch overhead dominate, so the T >= 2048 threshold stands.
    # Head dims > 256 (the VAE mid-block's single dim-512 head) stay on the
    # einsum path: there is no 128-lane padding waste to recover at d=512,
    # the logits tensor is modest (bh is 1·B for the VAE), and the flash
    # kernel's f32 lse side-output (bh, T, 128) at batch >= 8 gets
    # stack-allocated in VMEM by XLA and blows the 16 MB scoped budget
    # (seen as a Mosaic compile error in the bs=8 training sweep).
    if (backend == "flash" and q.shape[1] >= 2048 and q.shape[1] == k.shape[1]
            and q.shape[1] % 8 == 0 and q.shape[-1] <= 256):
        from reflecting_reality_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v)

    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class _Proj(nn.Module):
    """Parameter-only projection: registers kernel/bias under its module name
    (same tree layout as nn.Dense) but returns the arrays so callers can fuse
    several projections into one matmul."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, in_features: int):
        if not self.is_initializing():
            p = self.variables.get("params", {})
            if "kernel_q" in p:
                # ops/quant.quantize_params rewrote this projection: hand the
                # (int8 kernel, per-out-channel scale) pair to the caller so
                # the fused matmul can run on the int8 MXU
                bias = p.get("bias") if self.use_bias else None
                return (p["kernel_q"], p["kernel_scale"]), bias
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        return kernel, bias


class Attention(nn.Module):
    """Self/cross attention (reference Attention module semantics).

    q/k/v projections that share an input are fused into ONE matmul over
    trace-time-concatenated kernels (self-attention: qkv; cross-attention:
    kv); XLA hoists the loop-invariant concat out of the denoise scan.
    Isolated GEMM microbenchmarks show 10x for the fused form, but END TO END
    the UNet step is unchanged (33.6 steps/s either way — inside the full
    graph XLA already schedules the three projections well); kept for the
    reduced dispatch count and exact-parity safety (golden tests pass)."""

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None  # None -> self attention
    qkv_bias: bool = False   # UNet attention: no bias; VAE attention: bias
    out_bias: bool = True
    residual_connection: bool = False
    norm_num_groups: Optional[int] = None  # VAE attention uses group_norm
    rescale_output_factor: float = 1.0
    # IP-Adapter decoupled cross-attention (reference:
    # examples/brushnet/ip_adapter/attention_processor.py:282-307
    # IPAttnProcessor2_0): the LAST ip_num_tokens of encoder_hidden_states
    # attend through separate to_k_ip/to_v_ip and are added with ip_scale.
    # The reference default num_tokens=4 even though MirrorFusion appends a
    # single normal token — kept verbatim for checkpoint parity.
    ip_num_tokens: Optional[int] = None
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, T, C) or (B, H, W, C) when spatial
        encoder_hidden_states: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        inner_dim = self.heads * self.dim_head
        residual = hidden_states

        spatial = hidden_states.ndim == 4
        if spatial:
            b, h, w, c = hidden_states.shape
            if self.norm_num_groups is not None:
                hidden_states = GroupNorm(
                    num_groups=self.norm_num_groups, epsilon=1e-6, name="group_norm"
                )(hidden_states)
            hidden_states = hidden_states.reshape(b, h * w, c)

        context = encoder_hidden_states if encoder_hidden_states is not None else hidden_states

        ip_context = None
        if self.ip_num_tokens and encoder_hidden_states is not None:
            end = context.shape[1] - self.ip_num_tokens
            context, ip_context = context[:, :end], context[:, end:]

        c_in = hidden_states.shape[-1]
        ctx_in = context.shape[-1]
        wq, bq_ = _Proj(inner_dim, self.qkv_bias, name="to_q")(c_in)
        wk, bk_ = _Proj(inner_dim, self.qkv_bias, name="to_k")(ctx_in)
        wv, bv_ = _Proj(inner_dim, self.qkv_bias, name="to_v")(ctx_in)

        def matmul(x, w, b):
            if isinstance(w, tuple):
                # W8A8 serving mode (ops/quant.py): int8 GEMM, int32 MXU
                # accumulation, f32 dequant — same semantics as _dense_int8
                from reflecting_reality_tpu.ops.quant import _quantize_activation

                wq8, s_w = w
                xq, s_x = _quantize_activation(x)
                y = jax.lax.dot_general(
                    xq, wq8, (((x.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                out = y.astype(jnp.float32) * (s_x * s_w)
                if b is not None:
                    out = out + b.astype(jnp.float32)
                return out.astype(self.dtype)
            # nn.Dense dtype semantics: inputs and kernel cast to module dtype
            y = x.astype(self.dtype) @ w.astype(self.dtype)
            return y + b.astype(y.dtype) if b is not None else y

        def fuse(ws):
            """Concatenate projection kernels along the output axis; int8
            (kernel, scale) pairs fuse too (scales are per-out-channel, so
            concatenation is exact).  Mixed float/int8 -> None (no fusion)."""
            if all(isinstance(w, tuple) for w in ws):
                return (jnp.concatenate([w[0] for w in ws], axis=1),
                        jnp.concatenate([w[1] for w in ws]))
            if not any(isinstance(w, tuple) for w in ws):
                return jnp.concatenate(ws, axis=1)
            return None

        is_self = encoder_hidden_states is None
        if is_self:
            w_qkv = fuse([wq, wk, wv])
            if w_qkv is not None:
                b_qkv = (jnp.concatenate([bq_, bk_, bv_]) if self.qkv_bias else None)
                q, k, v = jnp.split(matmul(hidden_states, w_qkv, b_qkv), 3, axis=-1)
            else:
                q = matmul(hidden_states, wq, bq_)
                k = matmul(hidden_states, wk, bk_)
                v = matmul(hidden_states, wv, bv_)
        else:
            q = matmul(hidden_states, wq, bq_)
            w_kv = fuse([wk, wv])
            if w_kv is not None:
                b_kv = jnp.concatenate([bk_, bv_]) if self.qkv_bias else None
                k, v = jnp.split(matmul(context, w_kv, b_kv), 2, axis=-1)
            else:
                k = matmul(context, wk, bk_)
                v = matmul(context, wv, bv_)

        bq, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(bq, tq, self.heads, self.dim_head)
        k = k.reshape(bq, tk, self.heads, self.dim_head)
        v = v.reshape(bq, tk, self.heads, self.dim_head)

        out = dot_product_attention(q, k, v)

        if ip_context is not None:
            dense_ip = partial(nn.Dense, dtype=self.dtype, use_bias=False)
            k_ip = dense_ip(inner_dim, name="to_k_ip")(ip_context)
            v_ip = dense_ip(inner_dim, name="to_v_ip")(ip_context)
            ti = ip_context.shape[1]
            k_ip = k_ip.reshape(bq, ti, self.heads, self.dim_head)
            v_ip = v_ip.reshape(bq, ti, self.heads, self.dim_head)
            out = out + self.ip_scale * dot_product_attention(q, k_ip, v_ip)

        out = out.reshape(bq, tq, inner_dim)
        out = nn.Dense(self.query_dim, dtype=self.dtype, use_bias=self.out_bias, name="to_out_0")(out)

        if spatial:
            out = out.reshape(b, h, w, c)
        if self.residual_connection:
            out = out + residual
        if self.rescale_output_factor != 1.0:
            out = out / self.rescale_output_factor
        return out
