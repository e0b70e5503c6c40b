"""`flash_attn_func` API contract tests.

Mirrors the reference's executable preconditions
(reference: csrc/flash_attention_api.cpp:17-59 TORCH_CHECKs) and the
dispatch routing (reference: flash_attention/flash_attention.py:6-43).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_cute_tpu import flash_attn_func
from flash_attention_cute_tpu.ops.reference import attention_reference


def make(b=1, hq=4, hkv=2, sq=128, skv=128, d=64, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(0), 3)
    return (
        jax.random.normal(ks[0], (b, hq, sq, d), jnp.float32).astype(dtype),
        jax.random.normal(ks[1], (b, hkv, skv, d), jnp.float32).astype(dtype),
        jax.random.normal(ks[2], (b, hkv, skv, d), jnp.float32).astype(dtype),
    )


def test_default_scale_is_rsqrt_d():
    q, k, v = make()
    got = flash_attn_func(q, k, v, causal=True, interpret=True)
    want = attention_reference(q, k, v, softmax_scale=64 ** -0.5, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-2)


def test_decode_routing_matches_prefill_kernel():
    """seqlen_q == 1 goes through the packed decode kernel; result must agree
    with running the same inputs through the reference."""
    q, k, v = make(sq=1, skv=512)
    got = flash_attn_func(q, k, v, causal=True, interpret=True)
    want = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-2)


def test_cpu_fallback_without_interpret():
    q, k, v = make()
    got = flash_attn_func(q, k, v, causal=True)  # on_tpu() False under tests
    want = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize(
    "bad",
    [
        "rank", "kv_mismatch", "batch", "head_dim", "gqa_divisible",
        "dtype_mix", "dtype_unsupported", "head_dim_too_big",
    ],
)
def test_validation_errors(bad):
    q, k, v = make()
    if bad == "rank":
        q = q[0]
    elif bad == "kv_mismatch":
        v = v[:, :, :64]
    elif bad == "batch":
        q = jnp.concatenate([q, q], axis=0)
    elif bad == "head_dim":
        q = q[..., :32]
    elif bad == "gqa_divisible":
        q = q[:, :3]
    elif bad == "dtype_mix":
        k = k.astype(jnp.bfloat16)
    elif bad == "dtype_unsupported":
        q, k, v = (x.astype(jnp.int8) for x in (q, k, v))
    elif bad == "head_dim_too_big":
        q, k, v = make(d=512)
    with pytest.raises(ValueError):
        flash_attn_func(q, k, v)


def test_jittable_and_meta_traceable():
    """The analog of the reference's fake/meta kernel registration
    (flash_attention/flash_attention.py:40-43): the op must trace under jit
    and eval_shape without executing."""
    q, k, v = make()
    fn = jax.jit(lambda q, k, v: flash_attn_func(q, k, v, causal=True))
    shape = jax.eval_shape(fn, q, k, v)
    assert shape.shape == q.shape and shape.dtype == q.dtype
    out = fn(q, k, v)
    assert out.shape == q.shape


def test_logit_softcap_through_api():
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_attention_cute_tpu.api import flash_attention_forward
    from flash_attention_cute_tpu.ops.reference import attention_reference

    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (1, 4, 128, 64), jnp.float32)
    k = jax.random.normal(ks[1], (1, 2, 128, 64), jnp.float32)
    v = jax.random.normal(ks[2], (1, 2, 128, 64), jnp.float32)
    out = flash_attention_forward(
        q, k, v, causal=True, logit_softcap=20.0, interpret=True
    )
    ref = attention_reference(q, k, v, causal=True, logit_softcap=20.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-2)
    # decode path (seq_q == 1)
    out1 = flash_attention_forward(
        q[:, :, :1], k, v, causal=True, logit_softcap=20.0, interpret=True
    )
    ref1 = attention_reference(
        q[:, :, :1], k, v, causal=False, logit_softcap=20.0
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               atol=2e-5, rtol=2e-2)


def test_score_dtype_routes_to_prefill_and_rejects_other_paths():
    from flash_attention_cute_tpu.api import flash_attention_forward

    ks = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(ks[0], (1, 4, 128, 64), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 2, 128, 64), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, 2, 128, 64), jnp.bfloat16)
    out = flash_attention_forward(
        q, k, v, causal=True, score_dtype="int8", interpret=True
    )
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )
    # Decode and chunked-extend routes run bf16 scores — loud rejection
    # rather than a silently ignored argument.
    with pytest.raises(ValueError, match="dense prefill"):
        flash_attention_forward(
            q[:, :, :1], k, v, score_dtype="int8", interpret=True
        )
    with pytest.raises(ValueError, match="dense prefill"):
        flash_attention_forward(
            q, k, v, causal=True, score_dtype="int8",
            kv_length=jnp.full((1,), 128, jnp.int32), interpret=True
        )
