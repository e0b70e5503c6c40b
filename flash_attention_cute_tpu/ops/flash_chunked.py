"""Chunked-prefill flash-attention Pallas kernel (the "extend" path).

Computes attention for a chunk of S new queries over a fixed-capacity KV
cache whose valid prefix differs per sequence — the kernel behind
continuous batching's chunked prefill. Neither capability exists in the
reference (varlen/paged are open TODOs, reference: README.md:18-21); the
closest structure is the causal block-skip + tail masking of the fused
kernel (reference: csrc/mask.cuh:30-88, csrc/flash_attention_template.cuh:342-349),
generalized here to *per-batch traced* offsets:

  * `q_offset [B]` — global position of the chunk's first query row
    (the sequence's previous length). Causality is
    `kv_pos <= q_pos + q_offset[b]` — top-left within the global sequence.
  * `kv_length [B]` — valid cache prefix AFTER the chunk is written
    (= q_offset + S); cache positions past it are masked.
  * Both live in SMEM via scalar prefetch, so ONE compiled kernel serves
    every fill level — no recompiles during serving (the reference
    re-dispatches at C++ runtime per shape instead,
    csrc/kernel_dispatcher.h:21-52).
  * KV-block DMAs are *clamped*: the index map returns the last useful
    block for grid steps that the causal/length tests will skip, and
    Pallas elides the copy when consecutive indices coincide — the DMA
    analog of the reference's whole-block skip (csrc/mask.cuh:45-52).

Layout and online softmax are identical to ops/flash_fwd.py (transposed
S^T/O^T compute, lane-vector statistics, exp2 with log2e folded into Q).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_cute_tpu.ops.flash_fwd import (
    DEFAULT_MASK_VALUE,
    LOG2E,
    NUM_LANES,
    NUM_SUBLANES,
    _round_up,
)


def _flash_chunked_kernel(
    q_off_ref,  # [B] int32 scalar-prefetch
    kv_len_ref,  # [B] int32 scalar-prefetch
    q_ref,  # [1, 1, g, block_q, d] (pre-scaled)
    k_ref,  # [1, 1, block_kv, d]
    v_ref,  # [1, 1, block_kv, d]
    o_ref,  # [1, 1, g, block_q, d]
    *rest,  # with return_partials: m_out, l_out refs precede the scratch
    causal: bool,
    window: int | None,
    logit_softcap: float | None,
    return_partials: bool,
    group: int,
    block_q: int,
    block_kv: int,
    mask_value: float,
    kv_cap: int,  # true (unpadded) cache capacity
    inner: int,
):
    """Fused-group chunked kernel with the ANCHORED LAZY running max.

    Round-2 structure transplant from ops/flash_fwd._flash_fwd_kernel_fused:
    the whole GQA group rides one wide matmul pair per sub-block, the mask
    bias is built straight-line (chunk geometry is straddle-heavy — every
    call has a length tail and usually a diagonal), and sub-block 0 of
    every KV block anchors the running max strictly while later sub-blocks
    reference it lazily, keeping the max tree and rescale off the
    QK -> exp2 -> PV critical path (measured on the prefill kernel:
    softmax cost fully hidden; exact up to ~76 nats of within-block score
    spread, saturating gracefully beyond).
    """
    if return_partials:
        m_out, l_out, m_scratch, l_scratch, acc_scratch = rest
    else:
        m_scratch, l_scratch, acc_scratch = rest
    b = pl.program_id(0)
    q_blk = pl.program_id(2)
    kv_blk = pl.program_id(3)
    sub_kv = block_kv // inner

    q_off = q_off_ref[b]
    kv_len = kv_len_ref[b]

    @pl.when(kv_blk == 0)
    def _init():
        # Lazy max references the running max from BEFORE the current
        # sub-block; the strict anchor at each block's sub-block 0 rewrites
        # it, so any finite init is exact (it cancels in o = acc / l).
        m_scratch[...] = jnp.zeros_like(m_scratch)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    blk_start = kv_blk * block_kv
    should_run = blk_start < kv_len
    if causal:
        should_run &= blk_start <= q_off + (q_blk + 1) * block_q - 1
    if window is not None:
        should_run &= (
            blk_start + block_kv - 1 > q_off + q_blk * block_q - window
        )

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0].reshape(group * block_q, q_ref.shape[-1])

        for si in range(inner):
            sub_start = blk_start + si * sub_kv
            k = k_ref[0, 0, si * sub_kv : (si + 1) * sub_kv]
            v = v_ref[0, 0, si * sub_kv : (si + 1) * sub_kv]
            if kv_cap % block_kv:
                # The cache's seq axis is NOT padded host-side (a jnp.pad
                # would copy the whole cache per call — see
                # ops/flash_decode.py); the ragged final block's tail rows
                # are uninitialized. Zero BOTH tails: V because p = 0 does
                # not save the PV matmul from 0 * NaN, and K because the
                # mask is an ADDITIVE bias (NaN + mask_value stays NaN).
                rows = (
                    jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
                    + sub_start
                )
                v = jnp.where(rows < kv_cap, v, 0.0)
                k = jnp.where(rows < kv_cap, k, 0.0)

            s_t = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [sub_kv, group * block_q]
            if logit_softcap is not None:
                # Scores are in log2 units (scale*log2e folded into Q):
                # cap scales by log2e (see ops/flash_fwd.py). Pre-mask.
                cap2 = logit_softcap * LOG2E
                s_t = jnp.tanh(s_t * (1.0 / cap2)) * cap2

            # Straight-line mask build: chunk calls are straddle-heavy
            # (length tail + diagonal on most blocks), where inline beats
            # the lax.cond by ~8% (the cond serializes Mosaic's pipeline).
            kv_pos = jax.lax.broadcasted_iota(
                jnp.int32, (sub_kv, block_q), 0
            ) + sub_start
            q_pos = jax.lax.broadcasted_iota(
                jnp.int32, (sub_kv, block_q), 1
            ) + q_blk * block_q + q_off
            allowed = kv_pos < kv_len
            if causal:
                allowed &= kv_pos <= q_pos
            if window is not None:
                allowed &= kv_pos > q_pos - window
            bias = jnp.where(allowed, 0.0, mask_value).astype(jnp.float32)
            s_t = s_t + jnp.tile(bias, (1, group))

            m_prev = m_scratch[:1]
            if si == 0:
                # Strict anchor once per KV block (see flash_fwd.py).
                m_next = jnp.maximum(
                    m_prev, jnp.max(s_t, axis=0, keepdims=True)
                )
                alpha = jnp.exp2(m_prev - m_next)
                p_t = jnp.exp2(s_t - m_next)
                l_next = alpha * l_scratch[:1] + jnp.sum(
                    p_t, axis=0, keepdims=True
                )
                m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
                l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
                acc_scratch[...] *= alpha
                acc_scratch[...] += jax.lax.dot_general(
                    v, p_t.astype(v.dtype), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                # Lazy: p referenced to the anchor — exp2 starts without
                # waiting for this sub-block's max tree.
                p_t = jnp.exp2(jnp.minimum(s_t - m_prev, 110.0))
                l_tmp = l_scratch[:1] + jnp.sum(p_t, axis=0, keepdims=True)
                m_next = jnp.maximum(
                    m_prev, jnp.max(s_t, axis=0, keepdims=True)
                )
                alpha = jnp.exp2(m_prev - m_next)
                m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
                l_scratch[...] = jnp.broadcast_to(
                    l_tmp * alpha, l_scratch.shape
                )
                acc_scratch[...] += jax.lax.dot_general(
                    v, p_t.astype(v.dtype), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_scratch[...] *= alpha

    @pl.when(kv_blk == pl.num_programs(3) - 1)
    def _store():
        # q_offset >= 0 implies every real q row sees at least its own
        # position; only padded q rows can have l == 0 (trimmed after).
        # With return_partials the normalization is DEFERRED to the caller
        # (ring/split combines): emit unnormalized acc plus (m, l). The
        # combine algebra is exact for ANY reference point m, so the lazy
        # m (which may sit at its 0 init for dead chunks) composes — dead
        # chunks still contribute exp2(m - safe) * l = 0.
        d_pad_k = acc_scratch.shape[0]
        l_row = l_scratch[:1]  # [1, g * block_q]
        m_row = m_scratch[:1]
        if return_partials:
            o_ref[0, 0] = (
                acc_scratch[...].T.reshape(group, block_q, d_pad_k)
                .astype(o_ref.dtype)
            )
            m_out[0, 0] = jnp.broadcast_to(
                m_row.reshape(group, 1, block_q),
                (group, NUM_SUBLANES, block_q),
            )
            l_out[0, 0] = jnp.broadcast_to(
                l_row.reshape(group, 1, block_q),
                (group, NUM_SUBLANES, block_q),
            )
        else:
            l_inv = jnp.where(l_row == 0.0, 1.0, 1.0 / l_row)
            o_t = acc_scratch[...] * l_inv
            o_ref[0, 0] = (
                o_t.T.reshape(group, block_q, d_pad_k).astype(o_ref.dtype)
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "window", "logit_softcap", "return_partials",
        "block_q", "block_kv", "interpret", "debug",
    ),
)
def flash_attention_chunked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_offset: jax.Array,
    kv_length: jax.Array,
    sm_scale: float | None = None,
    causal: bool = True,
    window: int | None = None,
    logit_softcap: float | None = None,
    return_partials: bool = False,
    block_q: int = 0,
    block_kv: int = 0,
    interpret: bool = False,
    debug: bool = False,
):
    """Chunked-prefill attention over a partially filled cache.

    Args:
      q: [B, Hq, S, D] — the chunk's queries.
      k, v: [B, Hkv, C, D] — the KV cache at full capacity C, with the
        chunk's K/V already written at [q_offset, q_offset + S).
      q_offset: [B] int32 — global position of q row 0 per sequence.
      kv_length: [B] int32 — valid cache length per sequence INCLUDING the
        chunk (= q_offset + S).
      causal: top-left causality within the global sequence
        (kv_pos <= q_offset + row).
      window: optional sliding-window size (HF semantics).
      return_partials: emit the UNNORMALIZED accumulator plus the online-
        softmax statistics instead of the normalized output — the building
        block for cross-device/-split combines (ring attention). Returns
        (o_unnorm [B,Hq,S,D] f32, m [B,Hq,S] f32 log2-units, l [B,Hq,S]).

    Returns: [B, Hq, S, D] in q's dtype (or the partials triple).
    """
    b, hq, sq, d = q.shape
    bk, hkv, skv, dk = k.shape
    assert k.shape == v.shape, (k.shape, v.shape)
    assert b == bk and d == dk, (q.shape, k.shape)
    assert hq % hkv == 0, (hq, hkv)
    if sm_scale is None:
        sm_scale = d ** -0.5
    group = hq // hkv

    if block_q <= 0:
        block_q = 256
    if block_kv <= 0:
        block_kv = 256

    d_pad = _round_up(max(d, NUM_LANES), NUM_LANES)
    block_q = min(block_q, _round_up(sq, NUM_LANES))
    block_kv = min(block_kv, _round_up(skv, NUM_LANES))
    sq_pad = _round_up(sq, block_q)

    q = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)

    if d_pad != d:
        pad = [(0, 0)] * 3 + [(0, d_pad - d)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    if sq_pad != sq:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, sq_pad - sq), (0, 0)])
    # The cache seq axis is NOT padded (that would copy the whole cache
    # per call); the kernel zeroes the ragged final block's V tail.

    qg = q.reshape(b, hkv, group, sq_pad, d_pad)

    q_offset = q_offset.astype(jnp.int32)
    kv_length = jnp.minimum(kv_length.astype(jnp.int32), skv)

    # DYNAMIC kv-grid bound: only blocks up to the batch's max fill get
    # grid steps (dead capacity used to cost ~0.5 us of overhead per
    # skipped step — see ops/flash_decode.py).
    num_kv_dyn = jnp.maximum(pl.cdiv(jnp.max(kv_length), block_kv), 1)
    grid = (b, hkv, sq_pad // block_q, num_kv_dyn)

    def q_map(b_, h, i, j, qoff, kvl):
        return (b_, h, 0, i, 0)

    def kv_map(b_, h, i, j, qoff, kvl):
        # Clamp to the last block this (batch, q-tile) will actually use, so
        # skipped grid steps re-address the previous block and Pallas elides
        # the HBM->VMEM copy.
        last_len = jax.lax.div(kvl[b_] + block_kv - 1, block_kv) - 1
        limit = jnp.maximum(last_len, 0)
        if causal:
            last_causal = jax.lax.div(
                qoff[b_] + (i + 1) * block_q - 1, block_kv
            )
            limit = jnp.minimum(limit, jnp.maximum(last_causal, 0))
        return (b_, h, jnp.minimum(j, limit), 0)

    # Inner sub-blocks expose the lazy max's cross-sub-block MXU/VPU
    # overlap (see flash_fwd.py); sub-blocks need >= 8 sublanes.
    inner = 4
    while inner > 1 and (block_kv % inner or block_kv // inner < 8):
        inner -= 1

    kernel = functools.partial(
        _flash_chunked_kernel,
        causal=causal,
        window=window,
        logit_softcap=logit_softcap,
        return_partials=return_partials,
        group=group,
        block_q=block_q,
        block_kv=block_kv,
        mask_value=DEFAULT_MASK_VALUE,
        kv_cap=skv,
        inner=inner,
    )

    if return_partials:
        out_specs = [
            pl.BlockSpec((1, 1, group, block_q, d_pad), q_map),
            pl.BlockSpec(
                (1, 1, group, NUM_SUBLANES, block_q),
                lambda b_, h, i, j, qoff, kvl: (b_, h, 0, 0, i),
            ),
            pl.BlockSpec(
                (1, 1, group, NUM_SUBLANES, block_q),
                lambda b_, h, i, j, qoff, kvl: (b_, h, 0, 0, i),
            ),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, hkv, group, sq_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct(
                (b, hkv, group, NUM_SUBLANES, sq_pad), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (b, hkv, group, NUM_SUBLANES, sq_pad), jnp.float32
            ),
        ]
    else:
        out_specs = pl.BlockSpec((1, 1, group, block_q, d_pad), q_map)
        out_shape = jax.ShapeDtypeStruct(
            (b, hkv, group, sq_pad, d_pad), q.dtype
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, group, block_q, d_pad), q_map),
                pl.BlockSpec((1, 1, block_kv, d_pad), kv_map),
                pl.BlockSpec((1, 1, block_kv, d_pad), kv_map),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((NUM_SUBLANES, group * block_q), jnp.float32),
                pltpu.VMEM((NUM_SUBLANES, group * block_q), jnp.float32),
                pltpu.VMEM((d_pad, group * block_q), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary",
            ),
        ),
        interpret=interpret,
        debug=debug,
        name="flash_attention_chunked",
    )(q_offset, kv_length, qg, k, v)

    if return_partials:
        o_u, m_o, l_o = out
        o_u = o_u.reshape(b, hq, sq_pad, d_pad)[:, :, :sq, :d]
        m_o = m_o[:, :, :, 0].reshape(b, hq, sq_pad)[:, :, :sq]
        l_o = l_o[:, :, :, 0].reshape(b, hq, sq_pad)[:, :, :sq]
        return o_u, m_o, l_o

    out = out.reshape(b, hq, sq_pad, d_pad)
    if sq_pad != sq or d_pad != d:
        out = out[:, :, :sq, :d]
    return out
