"""Pallas groupnorm kernel parity vs the jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from reflecting_reality_tpu.ops.norms import group_norm
from reflecting_reality_tpu.ops.pallas.groupnorm import group_norm_silu_pallas


@pytest.mark.parametrize("shape,groups", [((2, 16, 16, 64), 8), ((1, 8, 8, 40), 4)])
@pytest.mark.parametrize("silu", [True, False])
def test_parity(shape, groups, silu):
    b, h, w, c = shape
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,))
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,))
    ref = group_norm(x, scale, bias, groups, 1e-5, apply_silu=silu)
    with pltpu.force_tpu_interpret_mode():
        got = group_norm_silu_pallas(x, scale, bias, groups, 1e-5, apply_silu=silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)
