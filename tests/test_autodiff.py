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


# ---- Pallas recompute backward (ops/flash_bwd.py), interpret mode ----
# interpret=True routes flash_attention through the Pallas forward
# (return_lse) + Pallas backward kernels; the oracle is XLA autodiff
# through the fp32 reference. The reference is forward-only — a real
# backward kernel is strictly beyond parity.


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)], ids=["mha", "gqa"])
def test_pallas_backward_matches_reference(causal, hq, hkv):
    # 640 rows -> 3 q/kv blocks of 256 (ragged against the block size),
    # exercising the block loops and the causal index-map clamps.
    q, k, v = make(jax.random.key(3), 1, hq, hkv, 640, 640, 64)

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, causal, None, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=causal) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-3
        )


@pytest.mark.parametrize("sq,skv", [(96, 256), (256, 96)])
def test_pallas_backward_cross_lengths(sq, skv):
    """Sq != Skv causal: bottom-right alignment (skv > sq) and fully-masked
    rows (sq > skv, grads must be exactly 0 there)."""
    q, k, v = make(jax.random.key(4), 1, 4, 2, sq, skv, 64)

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, True, None, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=True) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-3
        )
    if sq > skv:
        # Fully-masked leading rows: dq exactly zero.
        np.testing.assert_array_equal(
            np.asarray(g1[0][:, :, : sq - skv]), 0.0
        )


def test_pallas_backward_windowed():
    q, k, v = make(jax.random.key(5), 1, 4, 2, 320, 320, 32)

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, True, 48, True))

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=True, window=48))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-3
        )


def test_pallas_backward_bf16():
    q, k, v = make(jax.random.key(6), 1, 4, 2, 256, 256, 64)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def loss_pallas(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, None, True, None, True).astype(
                jnp.float32
            )
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            attention_reference(q, k, v, causal=True).astype(jnp.float32)
        )

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            atol=3e-2, rtol=3e-2,
        )


def test_fwd_return_lse_consistency():
    """flash_attention_fwd(return_lse=True): exp2-normalizing the scores by
    the returned lse must reproduce softmax row sums of 1 (and +inf on
    fully-masked rows)."""
    from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd

    q, k, v = make(jax.random.key(7), 1, 2, 2, 160, 96, 32)
    out, lse = flash_attention_fwd(
        q, k, v, causal=True, return_lse=True, interpret=True
    )
    out2 = flash_attention_fwd(q, k, v, causal=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # Rows 0..63 are fully masked (sq=160 > skv=96): lse = +inf.
    assert np.all(np.isinf(np.asarray(lse)[:, :, : 160 - 96]))
    # Live rows: sum_j exp2(s2_ij - lse_i) == 1.
    import math

    scale = 32 ** -0.5 * math.log2(math.e)
    s2 = np.einsum(
        "bhqd,bhkd->bhqk", np.asarray(q) * scale, np.asarray(k)
    )
    rows = np.arange(160)[:, None]
    cols = np.arange(96)[None, :]
    allowed = cols <= rows + (96 - 160)
    p = np.where(allowed[None, None], np.exp2(s2 - np.asarray(lse)[..., None]), 0.0)
    sums = p.sum(-1)[:, :, 160 - 96 :]
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)


def test_forward_value_is_kernel_path():
    """The VJP wrapper's forward must equal flash_attention_forward."""
    from flash_attention_cute_tpu.api import flash_attention_forward

    q, k, v = make(jax.random.key(2), 1, 2, 2, 128, 128, 64)
    o1 = flash_attention(q, k, v, None, True, None)
    o2 = flash_attention_forward(q, k, v, causal=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

def test_model_forward_differentiable_on_pallas_path():
    """jax.grad through the FULL model forward with the Pallas kernels
    (interpret mode): the api's dense-prefill route now carries the
    custom VJP, so model-level fine-tuning works on the kernel path —
    gradients must match the analytic XLA route."""
    import numpy as np

    from flash_attention_cute_tpu.models import forward, init_params
    from flash_attention_cute_tpu.models.config import tiny_test_config

    cfg = tiny_test_config(num_layers=2, dtype=jnp.float32)
    params = init_params(cfg, jax.random.key(3))
    ids = jax.random.randint(jax.random.key(4), (2, 24), 0, cfg.vocab_size)

    def loss(p, interpret):
        logits, _ = forward(p, cfg, ids, mode="prefill",
                            interpret=interpret)
        lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        return -jnp.mean(
            jnp.take_along_axis(lp, ids[:, 1:, None], axis=-1)
        )

    g_pallas = jax.grad(lambda p: loss(p, True))(params)
    g_ref = jax.grad(lambda p: loss(p, None))(params)  # XLA oracle off-TPU
    flat_p, _ = jax.tree_util.tree_flatten(g_pallas)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3
        )
