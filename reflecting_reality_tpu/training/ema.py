"""Exponential moving average of params (reference: src/diffusers/
training_utils.py:169 EMAModel; BASELINE.md asks for it as a training
option — the reference train script has the class but never wires it in,
so it's opt-in here too).

Functional: `ema_update(ema_params, params, step)` returns the new EMA tree;
decay warms up as min(decay, (1 + step) / (10 + step)), the diffusers
default ramp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, step, decay: float = 0.9999):
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    # accumulate in fp32, store back in the shadow copy's dtype (fp32 by
    # default; bf16 when TrainConfig.ema_dtype="bf16" halves the copy)
    return jax.tree_util.tree_map(
        lambda e, p: (e.astype(jnp.float32) * d
                      + p.astype(jnp.float32) * (1.0 - d)).astype(e.dtype),
        ema_params, params,
    )
