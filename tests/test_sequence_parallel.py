"""Sequence-parallel attention (all-gather + ring) vs dense reference.

Runs on the virtual 8-device CPU mesh; XLA collectives are identical code
single- vs multi-host, so passing here validates the real-mesh path
(SURVEY.md §4 multi-host test strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from flash_attention_cute_tpu.ops.reference import attention_reference
from flash_attention_cute_tpu.parallel.sequence import (
    allgather_attention,
    ring_attention,
)


@pytest.fixture(scope="module")
def sp_mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("sp",))


def make(key, b, hq, hkv, s, d):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, hkv, s, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_allgather_attention(sp_mesh, causal):
    q, k, v = make(jax.random.key(0), 2, 4, 2, 512, 64)
    out = allgather_attention(q, k, v, sp_mesh, causal=causal)
    ref = attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-5, rtol=2e-2,
    )


def test_allgather_attention_windowed(sp_mesh):
    q, k, v = make(jax.random.key(1), 1, 4, 2, 512, 64)
    out = allgather_attention(q, k, v, sp_mesh, causal=True, window=100)
    ref = attention_reference(q, k, v, causal=True, window=100)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-5, rtol=2e-2,
    )


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention(sp_mesh, causal):
    q, k, v = make(jax.random.key(2), 2, 4, 2, 512, 64)
    out = ring_attention(q, k, v, sp_mesh, causal=causal)
    ref = attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-5, rtol=2e-2,
    )


def test_ring_matches_allgather(sp_mesh):
    q, k, v = make(jax.random.key(3), 1, 8, 8, 1024, 64)
    o1 = ring_attention(q, k, v, sp_mesh, causal=True)
    o2 = allgather_attention(q, k, v, sp_mesh, causal=True)
    np.testing.assert_allclose(
        np.asarray(o1, np.float32), np.asarray(o2, np.float32),
        atol=2e-5, rtol=2e-2,
    )


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_pallas_partials(sp_mesh, causal):
    """Ring attention with in-kernel partials (interpret mode) must match
    the dense reference and the XLA-partials ring path."""
    q, k, v = make(jax.random.key(5), 1, 4, 2, 512, 64)
    out = ring_attention(q, k, v, sp_mesh, causal=causal, interpret=True)
    ref = attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-5, rtol=2e-2,
    )


def test_ring_causal_zigzag_skips_dead_chunks(sp_mesh):
    """Round-3: the causal kernel-partials ring must NOT compute its
    fully-masked chunks. With zig-zag striping every partial call is
    fully (or half, on the diagonal) live; the analytic computed-pair
    total must be ~S_global^2/2, not S_global^2 (the round-2 contiguous
    path computed n full chunks per shard). Parity stays exact."""
    import flash_attention_cute_tpu.parallel.sequence as seq

    calls: list[tuple[int, int]] = []
    orig = seq.flash_attention_chunked

    def spy(q_, k_, v_, *a, **kw):
        calls.append((q_.shape[2], k_.shape[2]))
        return orig(q_, k_, v_, *a, **kw)

    seq.flash_attention_chunked = spy
    try:
        q, k, v = make(jax.random.key(7), 1, 2, 2, 512, 64)
        out = ring_attention(q, k, v, sp_mesh, causal=True, interpret=True)
    finally:
        seq.flash_attention_chunked = orig
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-5, rtol=2e-2,
    )

    n = 8
    s_local = 512 // n
    half = s_local // 2
    # Trace-time call sites: own-pair makes a (half, half) diagonal call
    # and a (half, s_local) full+diagonal call; the off-diagonal branches
    # make one fully-live (s_local, half) or (half, s_local) call. No
    # (s_local, s_local) dead-chunk call may exist.
    assert set(calls) == {
        (half, half), (half, s_local), (s_local, half)
    }, calls
    # Analytic computed score-pairs: own-pair once per shard; the
    # src<idx branch runs idx times on shard idx; src>idx runs n-1-idx.
    computed = (
        n * (half * half + half * s_local)
        + sum(range(n)) * (s_local * half)
        + sum(range(n)) * (half * s_local)
    )
    live = (n * s_local) ** 2 / 2
    round2_path = n * n * s_local * s_local  # every shard, every chunk
    assert computed <= 1.10 * live, (computed, live)
    assert computed < 0.6 * round2_path, (computed, round2_path)
