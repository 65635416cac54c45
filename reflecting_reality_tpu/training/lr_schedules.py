"""LR schedules matching the reference's `optimization.get_scheduler`
(reference: src/diffusers/optimization.py:361 and
train_brushnet_mirror.py:1257-1264), as jnp-traceable step->lr functions
usable directly as optax schedules.

All schedules honor `num_warmup_steps` with linear warmup from 0, exactly
like the diffusers LambdaLR multipliers.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def get_schedule(
    name: str,
    learning_rate: float,
    num_warmup_steps: int = 0,
    num_training_steps: int | None = None,
    num_cycles: float = 0.5,
    power: float = 1.0,
    lr_end: float = 1e-7,
):
    w = max(int(num_warmup_steps), 0)

    def warm(step):
        return jnp.minimum((step + 0.0) / max(w, 1), 1.0) if w > 0 else 1.0

    if name in ("constant", "constant_with_warmup"):
        def fn(step):
            return learning_rate * warm(step)
        return fn

    assert num_training_steps is not None, f"{name} needs num_training_steps"
    t = int(num_training_steps)

    if name == "linear":
        def fn(step):
            decay = jnp.clip((t - step) / max(t - w, 1), 0.0, 1.0)
            return learning_rate * jnp.where(step < w, warm(step), decay)
        return fn

    if name == "cosine":
        def fn(step):
            progress = (step - w) / max(t - w, 1)
            decay = jnp.clip(
                0.5 * (1.0 + jnp.cos(math.pi * 2.0 * num_cycles * progress)), 0.0, 1.0
            )
            return learning_rate * jnp.where(step < w, warm(step), decay)
        return fn

    if name == "cosine_with_restarts":
        def fn(step):
            progress = (step - w) / max(t - w, 1)
            decay = 0.5 * (1.0 + jnp.cos(math.pi * ((num_cycles * progress) % 1.0) * 2.0))
            decay = jnp.where(progress >= 1.0, 0.0, decay)
            return learning_rate * jnp.where(step < w, warm(step), decay)
        return fn

    if name == "polynomial":
        def fn(step):
            pct = jnp.clip((t - step) / max(t - w, 1), 0.0, 1.0)
            decay = (learning_rate - lr_end) * pct ** power + lr_end
            return jnp.where(step < w, learning_rate * warm(step), decay)
        return fn

    raise ValueError(f"unknown lr scheduler {name!r}")
