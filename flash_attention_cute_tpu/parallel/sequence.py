"""Sequence/context parallelism: attention over a sequence-sharded mesh.

The reference handles long sequences only via its in-kernel KV-block loop
(reference: csrc/flash_attention_template.cuh:342-343); anything beyond one
device's HBM is out of scope there. Here (SURVEY.md §5 long-context):

  * `allgather_attention` — KV all-gathered over the `sp` axis, each shard
    runs the scalar-prefetch chunked Pallas kernel on its local queries
    with `q_offset = shard_index * S_local` (global causality falls out of
    the kernel's per-batch offset support). One collective, full kernel
    efficiency; KV memory O(S_global) per chip — the right choice while
    the gathered KV fits (e.g. 32k tokens of Llama-3-8B KV/layer = 16 MB).
  * `ring_attention` — K/V chunks rotate around the ring via `ppermute`
    while each shard folds one chunk per step into a running online
    softmax (the cross-chip version of the kernel's m/l/acc recurrence,
    csrc/flash_attention_template.cuh:445-487). KV memory O(S_local);
    compute of step t overlaps the DMA of step t+1 as XLA schedules the
    collective-permute asynchronously. Causal chunks strictly above the
    diagonal contribute nothing and are skipped via `where` masks.

Both are exact (parity-tested against the dense single-device reference on
a virtual 8-device mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flash_attention_cute_tpu.ops.flash_chunked import flash_attention_chunked
from flash_attention_cute_tpu.ops.reference import attention_reference


def allgather_attention(
    q: jax.Array,  # [B, H, S, D] — S sharded over `axis`
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "sp",
    causal: bool = True,
    sm_scale: float | None = None,
    window: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Sequence-parallel attention via KV all-gather over ICI."""

    def inner(q, k, v):
        n = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        b, h, s_local, d = q.shape
        kg = jax.lax.all_gather(k, axis, axis=2, tiled=True)
        vg = jax.lax.all_gather(v, axis, axis=2, tiled=True)
        q_off = jnp.full((b,), idx * s_local, jnp.int32)
        kv_len = jnp.full((b,), n * s_local, jnp.int32)
        if interpret is False or (interpret is None and _off_accel()):
            return attention_reference(
                q, kg, vg, softmax_scale=sm_scale, causal=causal,
                kv_length=kv_len, q_offset=q_off if causal else None,
                window=window,
            )
        return flash_attention_chunked(
            q, kg, vg, q_off, kv_len,
            sm_scale=sm_scale, causal=causal, window=window,
            interpret=bool(interpret),
        )

    spec = P(None, None, axis, None)
    return jax.shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def _off_accel() -> bool:
    from flash_attention_cute_tpu import dispatch

    return not dispatch.on_tpu()


def ring_attention(
    q: jax.Array,  # [B, H, S, D] — S sharded over `axis`
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "sp",
    causal: bool = True,
    sm_scale: float | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Sequence-parallel attention with O(S_local) KV memory per chip.

    Per ring step, each shard holds one rotating KV chunk and folds it
    into running (m, l, acc) online-softmax state; `ppermute` moves chunks
    to the next neighbor. On TPU (or with interpret=True) the per-chunk
    partial runs the PALLAS chunked kernel in return_partials mode — full
    fused-kernel efficiency per chip; the causal cases (full / diagonal /
    skip) collapse into one traced q_offset value (+S / 0 / -S). Off-
    accelerator the partial is computed with XLA ops.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5

    use_kernel = bool(interpret) or (interpret is None and not _off_accel())
    if use_kernel:
        return _ring_attention_kernel(
            q, k, v, mesh, axis, causal, sm_scale, bool(interpret)
        )

    def inner(q, k, v):
        n = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        b, hq, s_local, d = q.shape
        hkv = k.shape[1]
        if hkv != hq:
            rep = hq // hkv
            k_ = jnp.repeat(k, rep, axis=1)
            v_ = jnp.repeat(v, rep, axis=1)
        else:
            k_, v_ = k, v

        qf = q.astype(jnp.float32) * sm_scale
        rows = jnp.arange(s_local)

        perm = [(i, (i + 1) % n) for i in range(n)]

        def step(carry, t):
            k_t, v_t, m, l, acc = carry
            src = (idx - t) % n  # global chunk id currently held

            s = jnp.einsum(
                "bhqd,bhkd->bhqk", qf, k_t.astype(jnp.float32)
            )
            if causal:
                # Global causality at chunk granularity + in-chunk diagonal.
                cols = jnp.arange(s_local)
                in_chunk = cols[None, :] <= rows[:, None]
                allowed = jnp.where(
                    src == idx,
                    in_chunk,
                    jnp.broadcast_to((src < idx), (s_local, s_local)),
                )
                s = jnp.where(allowed[None, None], s, -jnp.inf)

            m_curr = jnp.max(s, axis=-1)  # [B,H,Sq]
            m_next = jnp.maximum(m, m_curr)
            # Guard -inf - -inf (fully masked chunk rows).
            safe_m = jnp.where(jnp.isneginf(m_next), 0.0, m_next)
            alpha = jnp.where(
                jnp.isneginf(m), 0.0, jnp.exp(m - safe_m)
            )
            p = jnp.exp(s - safe_m[..., None])
            p = jnp.where(jnp.isneginf(s), 0.0, p)
            l_next = alpha * l + jnp.sum(p, axis=-1)
            acc_next = alpha[..., None] * acc + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_t.astype(jnp.float32)
            )

            k_n = jax.lax.ppermute(k_t, axis, perm)
            v_n = jax.lax.ppermute(v_t, axis, perm)
            return (k_n, v_n, m_next, l_next, acc_next), None

        m0 = jnp.full((b, hq, s_local), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, hq, s_local), jnp.float32)
        acc0 = jnp.zeros((b, hq, s_local, d), jnp.float32)
        (k_f, v_f, m, l, acc), _ = jax.lax.scan(
            step, (k_, v_, m0, l0, acc0), jnp.arange(n)
        )
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        return (acc * l_inv[..., None]).astype(q.dtype)

    spec = P(None, None, axis, None)
    return jax.shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def _fold_partials(m, l, acc, m_c, l_c, o_u):
    """Fold one chunk's (o, m, l) partial into running log2-unit state."""
    m_new = jnp.maximum(m, m_c)
    safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
    a_old = jnp.where(jnp.isneginf(m), 0.0, jnp.exp2(m - safe))
    a_new = jnp.where(jnp.isneginf(m_c), 0.0, jnp.exp2(m_c - safe))
    l_next = a_old * l + a_new * l_c
    acc_next = a_old[..., None] * acc + a_new[..., None] * o_u
    return m_new, l_next, acc_next


def _ring_attention_kernel(q, k, v, mesh, axis, causal, sm_scale, interpret):
    """Ring attention with per-chunk Pallas partials (log2-unit stats).

    Causal runs use ZIG-ZAG (striped) sequence sharding — the round-2
    version computed its fully-masked chunks (q_offset = -S partials whose
    every row is dead, ~half the ring's FLOPs) and carried the classic
    ring imbalance (shard 0: 1 live chunk; shard n-1: n). Here shard idx
    holds global STRIPES (idx, 2n-1-idx) of s_local/2 rows each, so every
    ring step computes exactly one fully-live [s_local x s_local/2]-sized
    partial per shard:

      step 0 (own pair):   q_low x kv_low diagonal + q_high x (kv_low ++
                           kv_high) with offset s/2 (full + diagonal in
                           one call);
      src < idx:           both q stripes see kv_low in full -> one
                           [s_local x s/2] unmasked call;
      src > idx:           q_high sees both kv stripes in full -> one
                           [s/2 x s_local] unmasked call.

    Computed score-pairs total n*(2n+1) quarter-blocks vs the dense 4n^2
    — the ~S^2/2 causal bound (asserted in tests/test_sequence_parallel).
    The stripe exchange is two ppermutes in, two out; the rotating KV pair
    moves with one ppermute per step exactly as before.
    """

    def inner_noncausal(q, k, v):
        n = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        b, hq, s_local, d = q.shape
        perm = [(i, (i + 1) % n) for i in range(n)]
        kv_len = jnp.full((b,), s_local, jnp.int32)

        def step(carry, t):
            k_t, v_t, m, l, acc = carry
            q_off = jnp.full((b,), s_local, jnp.int32)  # fully visible
            o_u, m_c, l_c = flash_attention_chunked(
                q, k_t, v_t, q_off, kv_len,
                sm_scale=sm_scale, causal=True, return_partials=True,
                interpret=interpret,
            )
            m, l, acc = _fold_partials(m, l, acc, m_c, l_c, o_u)
            k_n = jax.lax.ppermute(k_t, axis, perm)
            v_n = jax.lax.ppermute(v_t, axis, perm)
            return (k_n, v_n, m, l, acc), None

        m0 = jnp.full((b, hq, s_local), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, hq, s_local), jnp.float32)
        acc0 = jnp.zeros((b, hq, s_local, d), jnp.float32)
        (_, _, m, l, acc), _ = jax.lax.scan(
            step, (k, v, m0, l0, acc0), jnp.arange(n)
        )
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        return (acc * l_inv[..., None]).astype(q.dtype)

    def inner_zigzag(q, k, v):
        n = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        b, hq, s_local, d = q.shape
        half = s_local // 2
        perm = [(i, (i + 1) % n) for i in range(n)]

        def to_zigzag(x):
            """Contiguous shard j (stripes 2j, 2j+1) -> zig-zag shard z
            (stripes z, 2n-1-z). Two ppermutes; which received half is the
            low stripe depends on the shard's parity."""
            lo_half, hi_half = x[:, :, :half], x[:, :, half:]
            # Even stripes g=2j travel to shard d(g)=g if g<n else 2n-1-g.
            perm_even = [
                (j, 2 * j if 2 * j < n else 2 * n - 1 - 2 * j)
                for j in range(n)
            ]
            perm_odd = [
                (j, 2 * j + 1 if 2 * j + 1 < n else 2 * n - 2 - 2 * j)
                for j in range(n)
            ]
            r_even = jax.lax.ppermute(lo_half, axis, perm_even)
            r_odd = jax.lax.ppermute(hi_half, axis, perm_odd)
            even_shard = idx % 2 == 0
            low = jnp.where(even_shard, r_even, r_odd)
            high = jnp.where(even_shard, r_odd, r_even)
            return low, high

        def from_zigzag(low, high):
            """Inverse stripe exchange (reverse each ppermute)."""
            perm_even = [
                (2 * j if 2 * j < n else 2 * n - 1 - 2 * j, j)
                for j in range(n)
            ]
            perm_odd = [
                (2 * j + 1 if 2 * j + 1 < n else 2 * n - 2 - 2 * j, j)
                for j in range(n)
            ]
            even_shard = idx % 2 == 0
            send_even = jnp.where(even_shard, low, high)
            send_odd = jnp.where(even_shard, high, low)
            r_lo = jax.lax.ppermute(send_even, axis, perm_even)
            r_hi = jax.lax.ppermute(send_odd, axis, perm_odd)
            return jnp.concatenate([r_lo, r_hi], axis=2)

        q_low, q_high = to_zigzag(q)
        k_low, k_high = to_zigzag(k)
        v_low, v_high = to_zigzag(v)
        q_zig = jnp.concatenate([q_low, q_high], axis=2)

        def partial(q_, k_, v_, off):
            b_ = q_.shape[0]
            return flash_attention_chunked(
                q_, k_, v_,
                jnp.full((b_,), off, jnp.int32),
                jnp.full((b_,), k_.shape[2], jnp.int32),
                sm_scale=sm_scale, causal=True, return_partials=True,
                interpret=interpret,
            )

        def pad_high(o_u, m_c, l_c):
            """Lift a q_high-only partial to full zig-row coverage."""
            z = jnp.zeros((b, hq, half, d), jnp.float32)
            o = jnp.concatenate([z, o_u], axis=2)
            m_pad = jnp.full((b, hq, half), -jnp.inf, jnp.float32)
            return (
                o,
                jnp.concatenate([m_pad, m_c], axis=2),
                jnp.concatenate([jnp.zeros((b, hq, half)), l_c], axis=2),
            )

        def step(carry, t):
            k_lo, k_hi, v_lo, v_hi, m, l, acc = carry
            src = (idx - t) % n  # whose stripe pair we currently hold

            def own_pair():
                # q_low x kv_low diagonal; q_high x (kv_low ++ kv_high)
                # full+diagonal via offset `half` in one call.
                o1, m1, l1 = partial(q_low, k_lo, v_lo, 0)
                kv_cat_k = jnp.concatenate([k_lo, k_hi], axis=2)
                kv_cat_v = jnp.concatenate([v_lo, v_hi], axis=2)
                o2, m2, l2 = partial(q_high, kv_cat_k, kv_cat_v, half)
                return (
                    jnp.concatenate([o1, o2], axis=2),
                    jnp.concatenate([m1, m2], axis=2),
                    jnp.concatenate([l1, l2], axis=2),
                )

            def earlier():  # src < idx: kv_low fully visible to all rows
                return partial(q_zig, k_lo, v_lo, s_local)

            def later():  # src > idx: q_high sees the whole pair in full
                kv_cat_k = jnp.concatenate([k_lo, k_hi], axis=2)
                kv_cat_v = jnp.concatenate([v_lo, v_hi], axis=2)
                return pad_high(*partial(q_high, kv_cat_k, kv_cat_v, s_local))

            o_u, m_c, l_c = jax.lax.cond(
                src == idx,
                own_pair,
                lambda: jax.lax.cond(src < idx, earlier, later),
            )
            m, l, acc = _fold_partials(m, l, acc, m_c, l_c, o_u)

            k_lo = jax.lax.ppermute(k_lo, axis, perm)
            k_hi = jax.lax.ppermute(k_hi, axis, perm)
            v_lo = jax.lax.ppermute(v_lo, axis, perm)
            v_hi = jax.lax.ppermute(v_hi, axis, perm)
            return (k_lo, k_hi, v_lo, v_hi, m, l, acc), None

        m0 = jnp.full((b, hq, s_local), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, hq, s_local), jnp.float32)
        acc0 = jnp.zeros((b, hq, s_local, d), jnp.float32)
        (_, _, _, _, m, l, acc), _ = jax.lax.scan(
            step, (k_low, k_high, v_low, v_high, m0, l0, acc0),
            jnp.arange(n),
        )
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        out = (acc * l_inv[..., None]).astype(q.dtype)
        return from_zigzag(out[:, :, :half], out[:, :, half:])

    s_local_static = q.shape[2] // mesh.shape[axis]
    use_zigzag = causal and s_local_static % 2 == 0
    inner = inner_zigzag if use_zigzag else inner_noncausal
    if causal and not use_zigzag:
        # Odd local length: fall back to the contiguous-chunk path with the
        # three-case offset (computes dead chunks; exact).
        def inner(q, k, v):  # noqa: F811
            n = jax.lax.axis_size(axis)
            idx = jax.lax.axis_index(axis)
            b, hq, s_local, d = q.shape
            perm = [(i, (i + 1) % n) for i in range(n)]
            kv_len = jnp.full((b,), s_local, jnp.int32)

            def step(carry, t):
                k_t, v_t, m, l, acc = carry
                src = (idx - t) % n
                off = jnp.where(
                    src < idx, s_local, jnp.where(src == idx, 0, -s_local)
                )
                q_off = jnp.full((b,), 0, jnp.int32) + off
                o_u, m_c, l_c = flash_attention_chunked(
                    q, k_t, v_t, q_off, kv_len,
                    sm_scale=sm_scale, causal=True, return_partials=True,
                    interpret=interpret,
                )
                m, l, acc = _fold_partials(m, l, acc, m_c, l_c, o_u)
                k_n = jax.lax.ppermute(k_t, axis, perm)
                v_n = jax.lax.ppermute(v_t, axis, perm)
                return (k_n, v_n, m, l, acc), None

            m0 = jnp.full((b, hq, s_local), -jnp.inf, jnp.float32)
            l0 = jnp.zeros((b, hq, s_local), jnp.float32)
            acc0 = jnp.zeros((b, hq, s_local, d), jnp.float32)
            (_, _, m, l, acc), _ = jax.lax.scan(
                step, (k, v, m0, l0, acc0), jnp.arange(n)
            )
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            return (acc * l_inv[..., None]).astype(q.dtype)

    spec = P(None, None, axis, None)
    return jax.shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
