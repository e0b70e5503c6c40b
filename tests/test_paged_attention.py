"""Paged-attention kernel + paged cache vs dense reference.

The oracle gathers each sequence's pages into a dense cache and runs the
fp32 reference — so these tests check both the DMA gather path and the
online softmax against ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_cute_tpu.ops.paged_attention import paged_attention_decode
from flash_attention_cute_tpu.ops.reference import attention_reference
from flash_attention_cute_tpu.runtime.paged_cache import (
    PageAllocator,
    PagedKVState,
    create_paged_state,
    paged_append_layer,
)


def build_paged(key, b, hkv, lengths, page_size, num_pages, pages_per_seq, d,
                dtype=jnp.float32, shuffle_seed=0):
    """Random paged cache with a scattered (shuffled) page assignment.

    Returns (k_pages, v_pages, page_table, dense_k, dense_v).
    """
    rng = np.random.RandomState(shuffle_seed)
    max_len = max(lengths)
    kk, kv = jax.random.split(key)
    dense_k = jax.random.normal(kk, (b, hkv, max_len, d), jnp.float32)
    dense_v = jax.random.normal(kv, (b, hkv, max_len, d), jnp.float32)

    k_pages = np.zeros((hkv, num_pages, page_size, d), np.float32)
    v_pages = np.zeros((hkv, num_pages, page_size, d), np.float32)
    table = np.zeros((b, pages_per_seq), np.int32)

    free = list(rng.permutation(np.arange(1, num_pages)))
    for bi, ln in enumerate(lengths):
        n_pages = -(-ln // page_size)
        for pi in range(n_pages):
            page = free.pop()
            table[bi, pi] = page
            lo = pi * page_size
            hi = min(lo + page_size, ln)
            k_pages[:, page, : hi - lo] = np.asarray(dense_k[bi, :, lo:hi])
            v_pages[:, page, : hi - lo] = np.asarray(dense_v[bi, :, lo:hi])

    return (
        jnp.asarray(k_pages, dtype),
        jnp.asarray(v_pages, dtype),
        jnp.asarray(table),
        dense_k.astype(dtype),
        dense_v.astype(dtype),
    )


def check_paged(b, hq, hkv, lengths, page_size=16, ppcb=4, d=64,
                dtype=jnp.float32, pages_per_seq=None):
    max_len = max(lengths)
    pages_per_seq = pages_per_seq or -(-max_len // page_size)
    num_pages = 1 + sum(-(-ln // page_size) for ln in lengths) + 3
    key = jax.random.key(hash((b, hq, max_len)) % (2**31))
    k_pages, v_pages, table, dense_k, dense_v = build_paged(
        key, b, hkv, lengths, page_size, num_pages, pages_per_seq, d, dtype
    )
    q = jax.random.normal(jax.random.key(7), (b, hq, 1, d), jnp.float32).astype(dtype)
    lens = jnp.asarray(lengths, jnp.int32)

    got = paged_attention_decode(
        q, k_pages, v_pages, lens, table,
        pages_per_compute_block=ppcb, interpret=True,
    )
    want = attention_reference(q, dense_k, dense_v, kv_length=lens)
    atol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=atol, rtol=2e-2,
    )


def test_basic_mha():
    check_paged(2, 4, 4, [64, 64])


def test_gqa_packing():
    check_paged(2, 8, 2, [128, 96])


def test_ragged_lengths_cross_page():
    # lengths that straddle page boundaries
    check_paged(3, 8, 2, [17, 33, 127], page_size=16, ppcb=2)


def test_length_one():
    check_paged(2, 8, 2, [1, 50])


def test_multiple_compute_blocks():
    check_paged(2, 4, 4, [512, 300], page_size=32, ppcb=4)


def test_bf16():
    check_paged(2, 8, 2, [200, 333], page_size=16, ppcb=4, dtype=jnp.bfloat16,
                d=128)


def test_zero_length_sequence():
    # One empty slot in the batch: output must be zeros, not NaN.
    b, hq, hkv, d, ps = 2, 4, 2, 64, 16
    key = jax.random.key(0)
    k_pages, v_pages, table, dense_k, dense_v = build_paged(
        key, b, hkv, [64, 64], ps, 16, 4, d
    )
    q = jax.random.normal(jax.random.key(1), (b, hq, 1, d))
    lens = jnp.array([0, 64], jnp.int32)
    got = paged_attention_decode(
        q, k_pages, v_pages, lens, table, pages_per_compute_block=2,
        interpret=True,
    )
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_array_equal(np.asarray(got[0]), 0.0)
    want = attention_reference(q, dense_k, dense_v, kv_length=lens)
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(want[1]), atol=2e-5, rtol=2e-2
    )


def test_paged_append_roundtrip():
    """paged_append_layer scatter must reproduce the dense layout."""
    cfg_like = type("C", (), dict(num_layers=1, num_kv_heads=2, head_dim=32))
    b, hkv, ps, d = 2, 2, 16, 32
    state = create_paged_state(cfg_like, num_pages=8, page_size=ps, batch=b,
                               pages_per_seq=4, dtype=jnp.float32)
    table = jnp.array([[1, 2, 0, 0], [3, 4, 0, 0]], jnp.int32)

    k1 = jax.random.normal(jax.random.key(0), (b, hkv, 20, d))
    v1 = jax.random.normal(jax.random.key(1), (b, hkv, 20, d))
    kp, vp = paged_append_layer(
        state.k_pages[0], state.v_pages[0], k1, v1, table,
        jnp.zeros((b,), jnp.int32),
    )
    # token 0..15 -> first page, 16..19 -> second page
    np.testing.assert_allclose(np.asarray(kp[:, 1]), np.asarray(k1[0, :, :16]))
    np.testing.assert_allclose(np.asarray(kp[:, 2, :4]), np.asarray(k1[0, :, 16:20]))
    np.testing.assert_allclose(np.asarray(vp[:, 3]), np.asarray(v1[1, :, :16]))

    # decode-step append at offset 20
    k2 = jax.random.normal(jax.random.key(2), (b, hkv, 1, d))
    kp2, _ = paged_append_layer(kp, vp, k2, k2, table, jnp.full((b,), 20, jnp.int32))
    np.testing.assert_allclose(np.asarray(kp2[:, 2, 4]), np.asarray(k2[0, :, 0]))
    np.testing.assert_allclose(np.asarray(kp2[:, 4, 4]), np.asarray(k2[1, :, 0]))


def test_page_allocator():
    alloc = PageAllocator(num_pages=16, page_size=16, pages_per_seq=8)
    assert alloc.num_free == 15
    assert alloc.allocate(seq_id=1, cur_len=0, new_tokens=40)  # 3 pages
    assert alloc.num_free == 12
    assert alloc.allocate(seq_id=1, cur_len=40, new_tokens=8)  # same page
    assert alloc.num_free == 12
    assert alloc.allocate(seq_id=1, cur_len=48, new_tokens=1)  # new page
    assert alloc.num_free == 11
    row = alloc.table_row(1)
    assert (row[:4] > 0).all() and (row[4:] == 0).all()
    alloc.release(1)
    assert alloc.num_free == 15
    # OOM path
    assert not alloc.allocate(seq_id=2, cur_len=0, new_tokens=16 * 16)


def test_paged_decode_windowed():
    """Sliding window over pages: only the last W tokens attend; the
    double-buffer prefetch must start new sequences at their window's
    first live block (stranded-DMA regression guard)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_attention_cute_tpu.ops.paged_attention import (
        paged_attention_decode,
    )
    from flash_attention_cute_tpu.ops.reference import attention_reference

    B, HQ, HKV, D, PS, PPS = 3, 8, 2, 64, 16, 8
    num_pages = B * PPS + 1
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, 1, D), jnp.float32)
    kp = jax.random.normal(ks[1], (HKV, num_pages, PS, D), jnp.float32)
    vp = jax.random.normal(ks[2], (HKV, num_pages, PS, D), jnp.float32)
    tbl = jnp.arange(1, B * PPS + 1, dtype=jnp.int32).reshape(B, PPS)
    lens = jnp.array([100, 37, 128], jnp.int32)
    window = 50

    out = paged_attention_decode(
        q, kp, vp, lens, tbl, window=window,
        pages_per_compute_block=2, interpret=True,
    )
    flat = (tbl * PS)[:, :, None] + jnp.arange(PS)[None, None, :]
    flat = flat.reshape(B, -1)
    kd = kp.reshape(HKV, num_pages * PS, D)
    vd = vp.reshape(HKV, num_pages * PS, D)
    kg = jax.vmap(lambda f: kd[:, f])(flat)
    vg = jax.vmap(lambda f: vd[:, f])(flat)
    ref = attention_reference(
        q, kg, vg, causal=False, kv_length=lens, window=window
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-5, rtol=2e-2,
    )


def test_paged_decode_logit_softcap():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_attention_cute_tpu.ops.paged_attention import (
        paged_attention_decode,
    )
    from flash_attention_cute_tpu.ops.reference import attention_reference

    B, HQ, HKV, D, PS, PPS = 2, 4, 2, 64, 16, 4
    num_pages = B * PPS + 1
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (B, HQ, 1, D), jnp.float32)
    kp = jax.random.normal(ks[1], (HKV, num_pages, PS, D), jnp.float32)
    vp = jax.random.normal(ks[2], (HKV, num_pages, PS, D), jnp.float32)
    tbl = jnp.arange(1, B * PPS + 1, dtype=jnp.int32).reshape(B, PPS)
    lens = jnp.array([60, 17], jnp.int32)
    out = paged_attention_decode(
        q, kp, vp, lens, tbl, logit_softcap=15.0,
        pages_per_compute_block=2, interpret=True,
    )
    flat = (tbl * PS)[:, :, None] + jnp.arange(PS)[None, None, :]
    flat = flat.reshape(B, -1)
    kd = kp.reshape(HKV, -1, D)
    vd = vp.reshape(HKV, -1, D)
    kg = jax.vmap(lambda f: kd[:, f])(flat)
    vg = jax.vmap(lambda f: vd[:, f])(flat)
    ref = attention_reference(
        q, kg, vg, causal=False, kv_length=lens, logit_softcap=15.0
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-5, rtol=2e-2,
    )
