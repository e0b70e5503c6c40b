"""Differentiable attention: custom-VJP grads vs XLA autodiff reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_cute_tpu.ops.autodiff import flash_attention
from flash_attention_cute_tpu.ops.reference import attention_reference


def make(key, b, hq, hkv, sq, skv, d):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, sq, d), jnp.float32)
    k = jax.random.normal(kk, (b, hkv, skv, d), jnp.float32)
    v = jax.random.normal(kv, (b, hkv, skv, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)], ids=["mha", "gqa"])
def test_grads_match_reference_autodiff(causal, hq, hkv):
    q, k, v = make(jax.random.key(0), 2, hq, hkv, 128, 128, 64)

    def loss_custom(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, causal, None) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=causal) ** 2)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-3
        )


def test_windowed_grads():
    q, k, v = make(jax.random.key(1), 1, 4, 2, 160, 160, 32)

    def loss_custom(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, True, 48))

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=True, window=48))

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-3
        )


def test_forward_value_is_kernel_path():
    """The VJP wrapper's forward must equal flash_attention_forward."""
    from flash_attention_cute_tpu.api import flash_attention_forward

    q, k, v = make(jax.random.key(2), 1, 2, 2, 128, 128, 64)
    o1 = flash_attention(q, k, v, None, True, None)
    o2 = flash_attention_forward(q, k, v, causal=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))