"""Opt-in W8A8 int8 serving mode for the denoise hot loop.

v5e's MXU runs int8 at 2x the bf16 rate (394 TOPS vs 197 TFLOPS), and the
exact denoise step is conv/GEMM-bound (benchmarks/PROFILE.md "Ceiling
evidence").  Measured on-chip (benchmarks/benchmark_int8.py): int8 wins
2.1-2.9x on the SD-1.5 trunk conv shapes and 1.6-2.0x on the feed-forward
GEMMs, so a quantized serving mode attacks exactly the bound resource.

Scheme (standard W8A8 dynamic quantization, cf. SmoothQuant/Q-Diffusion):
- weights: per-output-channel symmetric int8, quantized ONCE ahead of time
  (`quantize_params`) so the scan reads int8 weights from HBM (also halves
  weight bandwidth vs bf16);
- activations: per-tensor dynamic symmetric int8 (absmax each call) — no
  calibration pass needed, robust across timesteps;
- accumulation in int32 on the MXU, dequantized with s_x * s_w[oc] in f32,
  bias added in f32, output cast back to the module dtype.

Mechanism: `quantize_params` rewrites Conv/Dense `kernel` leaves to
`kernel_q` (int8) + `kernel_scale` (f32 per out-channel); at apply time a
Flax method interceptor (`int8_interceptor`) recognizes those modules and
computes the quantized forward instead of the float one.  The attention
q/k/v projections (parameter-only `_Proj` modules, fused at trace time)
participate directly: ops.attention runs the fused qkv/kv matmul as one
int8 GEMM when their kernels are quantized.  Modules whose kernels were
NOT selected run unchanged; a quantized param tree reaching a
non-intercepted apply fails loudly (the float `kernel` no longer exists).

This is an *approximation* mode like DeepCache/encoder-reuse (the reference
has no analogue; its half-precision inference policy is the closest knob —
pipeline_brushnet.py torch_dtype handling).  The exact path is untouched.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

QKERNEL = "kernel_q"
QSCALE = "kernel_scale"

# int8 symmetric range; 127 (not 128) keeps the grid symmetric around 0.
_QMAX = 127.0


def default_select(kernel: jnp.ndarray) -> bool:
    """Quantize only kernels where the int8 MXU pays: reduction dim >= 256
    (MXU tiles fill) and enough output channels to amortize the requant."""
    if kernel.ndim == 2:
        red, out = kernel.shape
    elif kernel.ndim == 4:
        kh, kw, cin, out = kernel.shape
        red = kh * kw * cin
    else:
        return False
    return red >= 256 and out >= 64


def select_all(kernel: jnp.ndarray) -> bool:
    """Quantize every conv/dense kernel regardless of size.  A QUALITY
    policy, not a perf one: tiny test configs have no kernel that clears
    default_select's MXU-payoff thresholds, so the quality protocol
    (benchmarks/benchmark_mode_quality.py) uses this to exercise the
    quantization math on every layer — strictly more quantization error
    than the selective full-scale policy, so measured tolerances remain
    upper bounds."""
    return kernel.ndim in (2, 4)


def quantize_kernel(kernel: jnp.ndarray):
    """Per-output-channel symmetric int8 quantization of a conv/dense kernel
    (out channels on the last axis, flax convention)."""
    w = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(amax, 1e-12) / _QMAX
    wq = jnp.clip(jnp.round(w / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return wq, scale


# Timestep/class conditioning stays exact: these MLPs are tiny (M = batch)
# so int8 buys nothing, and their output shifts every feature map in the net.
# to_q/to_k/to_v are handled by ops.attention itself (not the interceptor):
# _Proj returns the (int8 kernel, scale) pair when its tree is quantized and
# the fused qkv/kv matmul runs as one int8 GEMM with concatenated
# per-out-channel scales.
DEFAULT_EXCLUDE = ("time_embedding", "time_emb_proj", "add_embedding",
                   "class_embedding")


def quantize_params(params, select: Callable = default_select,
                    exclude: tuple = DEFAULT_EXCLUDE):
    """Rewrite every selected float `kernel` leaf in a flax param tree to
    {kernel_q: int8, kernel_scale: f32[out]}.  Kernels under a module path
    component in `exclude` are kept exact.  Biases and all other leaves are
    untouched.  Returns (new_tree, n_quantized)."""
    count = 0

    def walk(d, path):
        nonlocal count
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = walk(v, path + (k,))
            elif (k == "kernel" and hasattr(v, "ndim") and select(v)
                  and not any(e in p for p in path for e in exclude)):
                wq, scale = quantize_kernel(v)
                out[QKERNEL] = wq
                out[QSCALE] = scale
                count += 1
            else:
                out[k] = v
        return out

    new = walk(jax.tree_util.tree_map(lambda x: x, dict(params)), ())
    return new, count


def _quantize_activation(x: jnp.ndarray):
    """Per-tensor dynamic symmetric int8."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    s = jnp.maximum(amax, 1e-12) / _QMAX
    xq = jnp.clip(jnp.round(xf / s), -_QMAX, _QMAX).astype(jnp.int8)
    return xq, s


def _canon_tuple(v, n: int, default: int):
    if v is None:
        return (default,) * n
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def _canon_padding(padding, n: int):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return ((padding, padding),) * n
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return tuple(out)


def _resolve_padding(padding, spatial, kernel, strides):
    """Explicit ((lo,hi),...) padding for the conv (XLA SAME/VALID rules)."""
    pad = _canon_padding(padding, len(kernel))
    if pad == "VALID":
        return ((0, 0),) * len(kernel)
    if pad == "SAME":
        out = []
        for dim, k, s in zip(spatial, kernel, strides):
            o = -(-dim // s)  # ceil
            total = max((o - 1) * s + k - dim, 0)
            out.append((total // 2, total - total // 2))
        return tuple(out)
    return pad


def _conv_int8(mod: nn.Conv, x, wq, scale, bias):
    """nn.Conv.__call__ semantics (NHWC/HWIO, flax channel-last) in W8A8.

    XLA's int8 conv_general_dilated lowering does NOT reach the v5e int8 MXU
    well (measured 0.3-1.9x vs bf16, benchmarks/benchmark_int8_conv_v2.py);
    int8 dot_general does (1.6-2.8x).  So the conv is expressed as GEMMs:
    1x1 stride-1 convs contract directly over channels, and general kxk
    convs accumulate kh*kw zero-padded strided slices through int8
    dot_generals into int32 ("shifted" form — 2.5-2.8x vs the bf16 conv at
    every SD-1.5 trunk shape, quantize/dequant included)."""
    kh, kw, cin, cout = wq.shape
    b, h, w, _ = x.shape
    strides = _canon_tuple(mod.strides, 2, 1)
    pad = _resolve_padding(mod.padding, (h, w), (kh, kw), strides)
    dil_in = _canon_tuple(mod.input_dilation, 2, 1)
    dil_k = _canon_tuple(mod.kernel_dilation, 2, 1)
    generic = (dil_in != (1, 1) or dil_k != (1, 1)
               or mod.feature_group_count != 1 or not isinstance(pad, tuple))

    xq, s_x = _quantize_activation(x)
    if generic:
        dn = jax.lax.conv_dimension_numbers(
            x.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xq, wq, strides, _canon_padding(mod.padding, 2),
            lhs_dilation=dil_in, rhs_dilation=dil_k, dimension_numbers=dn,
            feature_group_count=mod.feature_group_count,
            preferred_element_type=jnp.int32,
        )
    elif (kh, kw) == (1, 1) and strides == (1, 1) and pad == ((0, 0), (0, 0)):
        y = jax.lax.dot_general(
            xq, wq[0, 0], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        (pt, pb), (pl, pr) = pad
        sy, sx = strides
        # symmetric quantization: the zero-point is 0, so zero-padding the
        # int8 tensor is exact
        xp = jnp.pad(xq, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        oh = (h + pt + pb - kh) // sy + 1
        ow = (w + pl + pr - kw) // sx + 1
        wg = wq.reshape(kh * kw, cin, cout)
        y = jnp.zeros((b, oh, ow, cout), jnp.int32)
        for ky in range(kh):
            for kx in range(kw):
                xs = jax.lax.slice(
                    xp, (0, ky, kx, 0),
                    (b, ky + sy * (oh - 1) + 1, kx + sx * (ow - 1) + 1, cin),
                    (1, sy, sx, 1),
                )
                y = y + jax.lax.dot_general(
                    xs, wg[ky * kw + kx], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
    out = y.astype(jnp.float32) * (s_x * scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(mod.dtype or x.dtype)


def _dense_int8(mod: nn.Dense, x, wq, scale, bias):
    xq, s_x = _quantize_activation(x)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (s_x * scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(mod.dtype or x.dtype)


def int8_interceptor(next_fun, args, kwargs, context):
    """`nn.intercept_methods` hook: route Conv/Dense whose params were
    rewritten by `quantize_params` through the W8A8 forward."""
    mod = context.module
    if context.method_name != "__call__" or not isinstance(mod, (nn.Conv, nn.Dense)):
        return next_fun(*args, **kwargs)
    params = mod.variables.get("params", {})
    if QKERNEL not in params:
        return next_fun(*args, **kwargs)
    wq = params[QKERNEL]
    scale = params[QSCALE]
    bias = params.get("bias") if mod.use_bias else None
    x = args[0]
    if isinstance(mod, nn.Conv):
        return _conv_int8(mod, x, wq, scale, bias)
    return _dense_int8(mod, x, wq, scale, bias)


def quantized_apply(module: nn.Module, params, *args, method=None, **kwargs):
    """`module.apply` with the int8 interceptor active.  Safe to call with an
    unquantized tree (the interceptor is then a no-op)."""
    with nn.intercept_methods(int8_interceptor):
        if method is not None:
            return module.apply(params, *args, method=method, **kwargs)
        return module.apply(params, *args, **kwargs)
