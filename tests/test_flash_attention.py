"""Pallas flash attention vs the XLA einsum reference (forward and VJP).

Runs in TPU-interpret mode on the CPU test mesh (the pattern SURVEY.md §4
prescribes for kernel parity: identical math, fixed PRNG, tolerance compare).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from reflecting_reality_tpu.ops.attention import dot_product_attention
from reflecting_reality_tpu.ops.pallas.flash_attention import flash_attention


def _rand_qkv(key, b, t, h, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, h, d), dtype)
    k = jax.random.normal(kk, (b, t, h, d), dtype)
    v = jax.random.normal(kv, (b, t, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize("t,h,d", [(256, 2, 40), (512, 1, 80)])
def test_forward_matches_einsum(t, h, d):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, t, h, d)
    ref = dot_product_attention(q, k, v, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_vjp_matches_einsum():
    t, h, d = 256, 2, 40
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, t, h, d)
    do = jax.random.normal(jax.random.PRNGKey(2), q.shape)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, backend="xla") * do)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128) * do)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


class TestWideHeadDispatch:
    """The VAE mid-block attention is one dim-512 head; at batch 8 the flash
    kernel's f32 lse side-output got stack-allocated in VMEM and blew the
    16 MB scoped budget on the real chip (bs=8 training sweep).  Wide heads
    now stay on the einsum path, and the kernel's own block limits scale
    down with head dim as defense in depth."""

    def test_vmem_limit_scales_with_head_dim(self):
        from reflecting_reality_tpu.ops.pallas.flash_attention import _vmem_limit

        assert _vmem_limit(1024, 128) == 1024
        assert _vmem_limit(1024, 256) == 512
        assert _vmem_limit(1024, 512) == 256
        assert _vmem_limit(1024, 1024) == 256  # floor

    def test_dispatcher_routes_wide_heads_to_einsum(self, monkeypatch):
        calls = []

        import reflecting_reality_tpu.ops.pallas.flash_attention as fa

        real = fa.flash_attention
        monkeypatch.setattr(fa, "flash_attention",
                            lambda *a, **k: calls.append(1) or real(*a, **k))
        q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 2048, 1, 512)
        with pltpu.force_tpu_interpret_mode():
            out = dot_product_attention(q, k, v, backend="flash")
        assert not calls  # einsum path took it
        ref = dot_product_attention(q, k, v, backend="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

    def test_wide_head_kernel_still_correct(self):
        # direct kernel use at d=512 remains numerically right with the
        # scaled-down blocks
        q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, 2048, 1, 512)
        q, k, v = q * 0.05, k * 0.05, v * 0.05
        ref = dot_product_attention(q, k, v, backend="xla")
        with pltpu.force_tpu_interpret_mode():
            got = flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
