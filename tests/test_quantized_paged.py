"""Quantized paged attention vs gathered-dequantized dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_cute_tpu.ops.quantized import (
    QuantizedKV,
    paged_attention_decode_quantized,
    paged_attention_extend_quantized,
    quantize_kv,
)
from flash_attention_cute_tpu.ops.reference import attention_reference


def setup(key, b, hq, hkv, pages_per_seq, page_size, d, qdtype=jnp.int8):
    num_pages = b * pages_per_seq + 1
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, 1, d), jnp.float32)
    k_dense = jax.random.normal(kk, (hkv, num_pages, page_size, d), jnp.float32)
    v_dense = jax.random.normal(kv, (hkv, num_pages, page_size, d), jnp.float32)
    kqz = quantize_kv(k_dense, qdtype)
    vqz = quantize_kv(v_dense, qdtype)
    tbl = jnp.arange(1, b * pages_per_seq + 1, dtype=jnp.int32).reshape(
        b, pages_per_seq
    )
    return q, kqz, vqz, tbl


def gather_dense(qz: QuantizedKV, tbl, page_size):
    """Dequantize + gather each sequence's pages into [B, Hkv, S, D]."""
    hkv, p, ps, d = qz.values.shape
    dense = qz.values.astype(jnp.float32) * qz.scales[..., None]
    flat = dense.reshape(hkv, p * ps, d)
    idx = (tbl * ps)[:, :, None] + jnp.arange(ps)[None, None, :]
    idx = idx.reshape(tbl.shape[0], -1)
    return jax.vmap(lambda f: flat[:, f])(idx)


@pytest.mark.parametrize("lengths", [[40, 17], [64, 64], [33, 0]])
@pytest.mark.parametrize("qdtype", [jnp.int8, jnp.float8_e4m3fn])
def test_quant_paged_matches_oracle(lengths, qdtype):
    b, hq, hkv, pps, ps, d = len(lengths), 8, 2, 4, 16, 64
    q, kqz, vqz, tbl = setup(jax.random.key(0), b, hq, hkv, pps, ps, d, qdtype)
    lens = jnp.array(lengths, jnp.int32)

    out = paged_attention_decode_quantized(
        q, kqz, vqz, lens, tbl, pages_per_compute_block=2, interpret=True
    )
    kg = gather_dense(kqz, tbl, ps)
    vg = gather_dense(vqz, tbl, ps)
    ref = attention_reference(q, kg, vg, causal=False, kv_length=lens)
    # Rows with length 0 emit zeros from the kernel; mask them in the ref.
    ref = jnp.where((lens > 0)[:, None, None, None], ref, 0.0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-3, rtol=2e-2,
    )


def test_quant_paged_gqa_block_sizes():
    b, hq, hkv, pps, ps, d = 2, 16, 4, 8, 8, 64
    q, kqz, vqz, tbl = setup(jax.random.key(1), b, hq, hkv, pps, ps, d)
    lens = jnp.array([60, 29], jnp.int32)
    o1 = paged_attention_decode_quantized(
        q, kqz, vqz, lens, tbl, pages_per_compute_block=2, interpret=True
    )
    o2 = paged_attention_decode_quantized(
        q, kqz, vqz, lens, tbl, pages_per_compute_block=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(o2), atol=1e-5, rtol=1e-5
    )


def setup_extend(key, b, hq, hkv, sq, pps, ps, d, qdtype=jnp.int8):
    num_pages = b * pps + 1
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, sq, d), jnp.float32)
    k_dense = jax.random.normal(kk, (hkv, num_pages, ps, d), jnp.float32)
    v_dense = jax.random.normal(kv, (hkv, num_pages, ps, d), jnp.float32)
    kqz = quantize_kv(k_dense, qdtype)
    vqz = quantize_kv(v_dense, qdtype)
    tbl = jnp.arange(1, b * pps + 1, dtype=jnp.int32).reshape(b, pps)
    return q, kqz, vqz, tbl


@pytest.mark.parametrize("offsets", [[0, 0], [50, 17]])
@pytest.mark.parametrize("qdtype", [jnp.int8, jnp.float8_e4m3fn])
def test_quant_paged_extend_matches_oracle(offsets, qdtype):
    """Chunked prefill over quantized pages (round-1 NotImplementedError):
    per-row causality against the gathered-dequantized oracle."""
    b, hq, hkv, sq, pps, ps, d = len(offsets), 4, 2, 16, 16, 8, 64
    q, kqz, vqz, tbl = setup_extend(
        jax.random.key(2), b, hq, hkv, sq, pps, ps, d, qdtype
    )
    q_off = jnp.array(offsets, jnp.int32)
    kv_len = q_off + sq

    out = paged_attention_extend_quantized(
        q, kqz, vqz, q_off, kv_len, tbl,
        pages_per_compute_block=2, interpret=True,
    )
    kg = gather_dense(kqz, tbl, ps)
    vg = gather_dense(vqz, tbl, ps)
    ref = attention_reference(
        q, kg, vg, causal=True, kv_length=kv_len, q_offset=q_off
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-3, rtol=2e-2,
    )


def test_quant_paged_extend_windowed_and_inactive():
    """Sliding window composes with quantized extend; a kv_length == 0 slot
    emits zeros without stranding prefetch DMAs."""
    b, hq, hkv, sq, pps, ps, d = 3, 8, 2, 8, 16, 8, 64
    q, kqz, vqz, tbl = setup_extend(
        jax.random.key(3), b, hq, hkv, sq, pps, ps, d
    )
    window = 24
    q_off = jnp.array([60, 0, 4], jnp.int32)
    kv_len = jnp.array([60 + sq, 0, 4 + sq], jnp.int32)

    out = paged_attention_extend_quantized(
        q, kqz, vqz, q_off, kv_len, tbl, window=window,
        pages_per_compute_block=2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out[1]), 0.0)
    kg = gather_dense(kqz, tbl, ps)
    vg = gather_dense(vqz, tbl, ps)
    for s_ in (0, 2):
        ref = attention_reference(
            q[s_ : s_ + 1], kg[s_ : s_ + 1], vg[s_ : s_ + 1], causal=True,
            kv_length=kv_len[s_ : s_ + 1], q_offset=q_off[s_ : s_ + 1],
            window=window,
        )
        np.testing.assert_allclose(
            np.asarray(out[s_ : s_ + 1], np.float32),
            np.asarray(ref, np.float32), atol=3e-3, rtol=2e-2,
        )


def test_quant_paged_extend_block_invariance():
    b, hq, hkv, sq, pps, ps, d = 1, 8, 2, 24, 16, 8, 64
    q, kqz, vqz, tbl = setup_extend(
        jax.random.key(5), b, hq, hkv, sq, pps, ps, d
    )
    q_off = jnp.array([77], jnp.int32)
    kv_len = q_off + sq
    o1 = paged_attention_extend_quantized(
        q, kqz, vqz, q_off, kv_len, tbl,
        pages_per_compute_block=2, interpret=True,
    )
    o2 = paged_attention_extend_quantized(
        q, kqz, vqz, q_off, kv_len, tbl,
        pages_per_compute_block=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=1e-5, rtol=1e-5)


def test_quant_paged_windowed():
    b, hq, hkv, pps, ps, d = 2, 8, 2, 6, 16, 64
    q, kqz, vqz, tbl = setup(jax.random.key(4), b, hq, hkv, pps, ps, d)
    lens = jnp.array([90, 33], jnp.int32)
    window = 40
    out = paged_attention_decode_quantized(
        q, kqz, vqz, lens, tbl, window=window,
        pages_per_compute_block=2, interpret=True,
    )
    kg = gather_dense(kqz, tbl, ps)
    vg = gather_dense(vqz, tbl, ps)
    ref = attention_reference(
        q, kg, vg, causal=False, kv_length=lens, window=window
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-3, rtol=2e-2,
    )


def test_quant_paged_decode_softcap():
    """Round-3: logit_softcap composes with int8 paged decode — compare
    against the dequantized oracle with the tanh cap applied to the
    scaled scores."""
    b, hq, hkv, pps, ps, d = 2, 8, 2, 4, 16, 64
    q, kqz, vqz, tbl = setup(jax.random.key(5), b, hq, hkv, pps, ps, d)
    lens = jnp.array([50, 23], jnp.int32)
    cap = 10.0

    out = paged_attention_decode_quantized(
        q, kqz, vqz, lens, tbl, pages_per_compute_block=2,
        logit_softcap=cap, interpret=True,
    )
    kg = gather_dense(kqz, tbl, ps)
    vg = gather_dense(vqz, tbl, ps)
    scale = d ** -0.5
    kf = jnp.repeat(kg, hq // hkv, 1)
    vf = jnp.repeat(vg, hq // hkv, 1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, kf) * scale
    s = jnp.tanh(s / cap) * cap
    cols = jnp.arange(kf.shape[2])[None, None, None, :]
    s = jnp.where(cols < lens[:, None, None, None], s, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), vf)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-3, rtol=2e-2,
    )


def test_quant_paged_extend_chunk_split_matches_unsplit(monkeypatch):
    """VMEM-driven chunk-axis split on the quantized extend path (same
    budget logic as the dense twin — regression for the scoped-VMEM OOM
    at large bucket x group packings)."""
    import flash_attention_cute_tpu.ops.paged_attention as pa

    b, hq, hkv, sq, pps, ps, d = 2, 4, 2, 48, 16, 8, 64
    q, kqz, vqz, tbl = setup_extend(
        jax.random.key(23), b, hq, hkv, sq, pps, ps, d
    )
    q_off = jnp.array([40, 0], jnp.int32)
    kv_len = q_off + sq
    kwargs = dict(pages_per_compute_block=2, interpret=True)

    base = paged_attention_extend_quantized(
        q, kqz, vqz, q_off, kv_len, tbl, **kwargs)

    monkeypatch.setattr(pa, "MAX_EXTEND_ROWS", 8)
    paged_attention_extend_quantized.clear_cache()
    try:
        out = paged_attention_extend_quantized(
            q, kqz, vqz, q_off, kv_len, tbl, **kwargs)
    finally:
        monkeypatch.undo()
        paged_attention_extend_quantized.clear_cache()

    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(base, np.float32),
        atol=1e-6, rtol=0,
    )
    kg = gather_dense(kqz, tbl, ps)
    vg = gather_dense(vqz, tbl, ps)
    ref = attention_reference(
        q, kg, vg, causal=True, kv_length=kv_len, q_offset=q_off
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-3, rtol=2e-2,
    )
