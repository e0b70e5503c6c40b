"""Variable-length (packed ragged batch) flash-attention Pallas kernel.

Completes the reference's top roadmap TODO (reference: README.md:18
"varlen") TPU-natively. Instead of CUDA-style per-sequence pointer math
over a ragged buffer, sequences are PACKED along one token axis and
delimited by int32 metadata vectors — static shapes end to end, which is
what XLA/Mosaic require:

  q tokens:  seg_q[t]   sequence id (non-decreasing; padding = big sentinel)
             bound_q[t] causal bound of token t = its position within its
                        sequence + (kv_len - q_len) of that sequence, so
                        per-sequence BOTTOM-RIGHT causal alignment
                        (reference: csrc/mask.cuh:37-39) falls out of one
                        comparison: allowed iff pos_kv <= bound_q.
  kv tokens: seg_kv[t], pos_kv[t] (position within its sequence).

Masking is `seg equal AND causal AND window` built per straddling tile and
shared across the GQA q-head group; whole tiles are skipped when the
segment ranges of the q and kv tiles don't overlap (the varlen analog of
the causal block skip, csrc/mask.cuh:45-52), and — when every sequence has
q_len == kv_len (standard prefill packing) — when the tile lies entirely
above the global diagonal.

Public API mirrors flash-attn's varlen entry point:
`flash_attention_varlen(q, k, v, cu_seqlens_q, cu_seqlens_kv)` with
q [Tq, Hq, D] / k,v [Tkv, Hkv, D] and cumulative-length vectors
[num_seqs + 1]; the metadata vectors above are derived inside jit.
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


def _flash_varlen_kernel(
    first_ref,  # [num_q_blocks] int32 scalar-prefetch: first live kv block
    last_ref,  # [num_q_blocks] int32: last live kv block (inclusive)
    qseg_ref,  # [1, block_q] int32
    qbound_ref,  # [1, block_q] int32
    kseg_ref,  # [1, block_kv] int32
    kpos_ref,  # [1, block_kv] int32
    q_ref,  # [1, g, block_q, d] (pre-scaled)
    k_ref,  # [1, block_kv, d]
    v_ref,  # [1, block_kv, d]
    o_ref,  # [1, g, block_q, d]
    m_scratch,  # [NUM_SUBLANES, g * block_q] f32 (row 0 live)
    l_scratch,
    acc_scratch,  # [d, g * block_q] f32
    *,
    causal: bool,
    window: int | None,
    logit_softcap: float | None,
    equal_lengths: bool,
    group: int,
    block_q: int,
    block_kv: int,
    mask_value: float,
    inner: int,
):
    """Fused-group varlen kernel with the ANCHORED LAZY running max
    (round-2 structure transplant from ops/flash_fwd; see there for the
    measured rationale — softmax fully hidden behind the matmuls, exact
    up to ~76 nats of within-KV-block score spread)."""
    q_blk = pl.program_id(1)
    t = pl.program_id(2)
    num_steps = pl.num_programs(2)
    sub_kv = block_kv // inner
    # Band-limited grid: the kv step walks [first, last] of THIS q block
    # only, instead of every kv block of the packed batch (the grid is
    # sized by max_seqlen, not total tokens — O(T * max_len), not O(T^2)).
    kv_blk = first_ref[q_blk] + t

    @pl.when(t == 0)
    def _init():
        # Any finite init is exact for the lazy max (it cancels in
        # o = acc / l; the strict anchor at sub-block 0 rewrites it).
        m_scratch[...] = jnp.zeros_like(m_scratch)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Segment-range overlap test from tile endpoints (ids non-decreasing).
    qs_lo = qseg_ref[0, 0]
    qs_hi = qseg_ref[0, block_q - 1]
    ks_lo = kseg_ref[0, 0]
    ks_hi = kseg_ref[0, block_kv - 1]
    should_run = jnp.logical_and(ks_lo <= qs_hi, ks_hi >= qs_lo)
    should_run = jnp.logical_and(should_run, kv_blk <= last_ref[q_blk])
    if causal and equal_lengths:
        # Equal q/kv packing: per-sequence causality implies the global
        # diagonal, so tiles strictly above it never contribute.
        should_run = jnp.logical_and(
            should_run, kv_blk * block_kv <= (q_blk + 1) * block_q - 1
        )

    @pl.when(should_run)
    def _run():
        q = q_ref[0].reshape(group * block_q, q_ref.shape[-1])

        for si in range(inner):
            k = k_ref[0, si * sub_kv : (si + 1) * sub_kv]
            v = v_ref[0, si * sub_kv : (si + 1) * sub_kv]

            s_t = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [sub_kv, group * block_q]
            if logit_softcap is not None:
                cap2 = logit_softcap * LOG2E  # scores are in log2 units
                s_t = jnp.tanh(s_t * (1.0 / cap2)) * cap2

            # Straight-line mask build: measured on v5e (32 ragged seqs of
            # 100-2048 tokens, 512-blocks) 5.27 ms inline vs 6.27 ms with
            # a lax.cond interior-skip — at ragged-packing tile geometry
            # most tiles straddle a segment or the diagonal, and the cond
            # itself serializes Mosaic's pipeline (see flash_fwd.py).
            def build_bias(si=si):
                kseg = kseg_ref[0, si * sub_kv : (si + 1) * sub_kv].reshape(
                    sub_kv, 1
                )
                qseg = qseg_ref[0].reshape(1, block_q)
                allowed = kseg == qseg
                if causal or window is not None:
                    kpos = kpos_ref[
                        0, si * sub_kv : (si + 1) * sub_kv
                    ].reshape(sub_kv, 1)
                    qbound = qbound_ref[0].reshape(1, block_q)
                if causal:
                    allowed &= kpos <= qbound
                if window is not None:
                    allowed &= kpos > qbound - window
                bias = jnp.where(allowed, 0.0, mask_value).astype(
                    jnp.float32
                )
                return jnp.tile(bias, (1, group))

            s_t = s_t + build_bias()

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

    @pl.when(t == num_steps - 1)
    def _store():
        # l == 0 covers padded q rows and (Sq > Skv per sequence) fully
        # masked rows -> exact 0 (reference: template.cuh:520-528 guard).
        # Rows whose l is polluted by mask_value terms inside a visited
        # tile are killed via bound < 0 (no kv position can satisfy
        # pos <= bound < 0).
        d_pad_k = acc_scratch.shape[0]
        l_row = l_scratch[:1]  # [1, g * block_q]
        l_inv = jnp.where(l_row == 0.0, 1.0, 1.0 / l_row)
        if causal:
            dead = jnp.tile(qbound_ref[0].reshape(1, block_q) < 0, (1, group))
            l_inv = jnp.where(dead, 0.0, l_inv)
        o_t = acc_scratch[...] * l_inv
        o_ref[0] = o_t.T.reshape(group, block_q, d_pad_k).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "window", "logit_softcap", "equal_lengths",
        "max_seqlen", "block_q", "block_kv", "stable", "interpret", "debug",
    ),
)
def flash_attention_packed(
    q: jax.Array,  # [Hq, Tq, D]
    k: jax.Array,  # [Hkv, Tkv, D]
    v: jax.Array,
    q_segment_ids: jax.Array,  # [Tq] int32, non-decreasing
    kv_segment_ids: jax.Array,  # [Tkv] int32, non-decreasing
    q_bounds: jax.Array | None = None,  # [Tq] int32 causal bounds
    kv_positions: jax.Array | None = None,  # [Tkv] int32 in-seq positions
    sm_scale: float | None = None,
    causal: bool = False,
    window: int | None = None,
    logit_softcap: float | None = None,
    equal_lengths: bool = False,
    max_seqlen: int = 0,
    block_q: int = 0,
    block_kv: int = 0,
    stable: bool | str = True,
    interpret: bool = False,
    debug: bool = False,
) -> jax.Array:
    """Packed-segment attention core. See `flash_attention_varlen` for the
    cu_seqlens front end. `q_bounds`/`kv_positions` are required when
    causal or window masking is on.

    `max_seqlen` (static; 0 = assume worst case Tkv) bounds the longest
    single sequence and sizes the band-limited kv grid: each q block only
    walks the kv blocks its segments can touch, so work is
    O(T * max_seqlen), not O(T^2). Measured (32 ragged seqs of 100-2048
    tokens, v5e): unbanded 73.4 ms, banded 15.9 ms — 1.18x FASTER than
    padded-dense instead of 3.9x slower."""
    hq, tq, d = q.shape
    hkv, tkv, dk = k.shape
    assert k.shape == v.shape and d == dk
    assert hq % hkv == 0
    if sm_scale is None:
        sm_scale = d ** -0.5
    group = hq // hkv
    if causal or window is not None:
        assert q_bounds is not None and kv_positions is not None

    if block_q <= 0:
        block_q = 512
    if block_kv <= 0:
        block_kv = 512

    d_pad = _round_up(max(d, NUM_LANES), NUM_LANES)
    block_q = min(block_q, _round_up(tq, NUM_LANES))
    block_kv = min(block_kv, _round_up(tkv, NUM_LANES))
    tq_pad = _round_up(tq, block_q)
    tkv_pad = _round_up(tkv, block_kv)

    q = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)

    if d_pad != d:
        pad = [(0, 0), (0, 0), (0, d_pad - d)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    # Distinct monotone-preserving sentinels: padded kv can never equal any
    # real or padded q segment and vice versa.
    big = jnp.iinfo(jnp.int32).max
    q_segment_ids = jnp.pad(
        q_segment_ids.astype(jnp.int32), (0, tq_pad - tq),
        constant_values=big - 1,
    )
    kv_segment_ids = jnp.pad(
        kv_segment_ids.astype(jnp.int32), (0, tkv_pad - tkv),
        constant_values=big,
    )
    if q_bounds is None:
        q_bounds = jnp.zeros((tq,), jnp.int32)
    if kv_positions is None:
        kv_positions = jnp.zeros((tkv,), jnp.int32)
    q_bounds = jnp.pad(
        q_bounds.astype(jnp.int32), (0, tq_pad - tq), constant_values=-1
    )
    kv_positions = jnp.pad(
        kv_positions.astype(jnp.int32), (0, tkv_pad - tkv),
        constant_values=big,
    )
    if tq_pad != tq:
        q = jnp.pad(q, [(0, 0), (0, tq_pad - tq), (0, 0)])
    if tkv_pad != tkv:
        pad = [(0, 0), (0, tkv_pad - tkv), (0, 0)]
        k, v = (jnp.pad(x, pad) for x in (k, v))

    qg = q.reshape(hkv, group, tq_pad, d_pad)

    num_q_blocks = tq_pad // block_q
    num_kv_blocks = tkv_pad // block_kv

    # Per-q-block live kv range [first, last] from the segment metadata:
    # first = start of the block's first segment; last = the causal bound
    # (or segment end) of the block's last row. Computed with cheap XLA
    # gathers; consumed via scalar prefetch by the kernel AND the index
    # maps (skipped steps re-address block `first`, eliding their DMAs).
    blk_starts = jnp.arange(num_q_blocks, dtype=jnp.int32) * block_q
    blk_ends = jnp.minimum(blk_starts + block_q - 1, tq - 1)
    seg_lo = q_segment_ids[blk_starts]
    seg_hi = q_segment_ids[blk_ends]
    # kv start index of a segment: first kv token whose seg id >= seg.
    kv_seg_start = jnp.searchsorted(
        kv_segment_ids[:tkv], seg_lo, side="left"
    ).astype(jnp.int32)
    first_blk = jnp.clip(kv_seg_start // block_kv, 0, num_kv_blocks - 1)
    kv_seg_end = jnp.searchsorted(
        kv_segment_ids[:tkv], seg_hi, side="right"
    ).astype(jnp.int32) - 1  # last kv token of the block's last segment
    if causal:
        last_seg_start = jnp.searchsorted(
            kv_segment_ids[:tkv], seg_hi, side="left"
        ).astype(jnp.int32)
        causal_end = last_seg_start + jnp.maximum(q_bounds[blk_ends], 0)
        kv_seg_end = jnp.minimum(kv_seg_end, causal_end)
    last_blk = jnp.clip(kv_seg_end // block_kv, 0, num_kv_blocks - 1)
    last_blk = jnp.maximum(last_blk, first_blk)

    if max_seqlen <= 0:
        max_seqlen = tkv
    # Band-limiting the kv walk is only sound for EQUAL q/kv packing: there
    # a q block's kv extent is bounded by one max-length segment plus the
    # block's own extent (kv positions advance in lockstep with q). With
    # cu_seqlens_kv != cu_seqlens_q (kv longer than q — e.g. chunked-prefill
    # packing) one q block of block_q tokens can span many segments whose
    # combined kv extent is unbounded by max_seqlen + block_q, so the full
    # kv grid must be walked (the [first, last] per-block range still elides
    # the DMAs and compute of dead steps — only the grid is worst-case).
    if equal_lengths:
        kv_steps = min(
            num_kv_blocks,
            -(-(max_seqlen + block_q) // block_kv) + 1,
        )
    else:
        kv_steps = num_kv_blocks

    grid = (hkv, num_q_blocks, kv_steps)

    # stable=True: anchored lazy max over 4 inner sub-blocks (+11% on the
    # ragged v5e benchmark; exact up to ~76 nats of within-KV-block score
    # spread, saturating gracefully beyond — see ops/flash_fwd.py).
    # stable="strict": one strict sub-block per KV block, exact always.
    inner = 1 if stable == "strict" else 4
    while inner > 1 and (block_kv % inner or block_kv // inner < 8):
        inner -= 1

    kernel = functools.partial(
        _flash_varlen_kernel,
        causal=causal,
        window=window,
        logit_softcap=logit_softcap,
        equal_lengths=equal_lengths,
        group=group,
        block_q=block_q,
        block_kv=block_kv,
        mask_value=DEFAULT_MASK_VALUE,
        inner=inner,
    )

    def qmeta_map(h, i, t, first, last):
        return (0, i)

    def kv_blk_idx(i, t, first, last):
        return jnp.minimum(first[i] + t, num_kv_blocks - 1)

    def kmeta_map(h, i, t, first, last):
        return (0, kv_blk_idx(i, t, first, last))

    def kv_map(h, i, t, first, last):
        return (h, kv_blk_idx(i, t, first, last), 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q), qmeta_map),
                pl.BlockSpec((1, block_q), qmeta_map),
                pl.BlockSpec((1, block_kv), kmeta_map),
                pl.BlockSpec((1, block_kv), kmeta_map),
                pl.BlockSpec(
                    (1, group, block_q, d_pad),
                    lambda h, i, t, first, last: (h, 0, i, 0),
                ),
                pl.BlockSpec((1, block_kv, d_pad), kv_map),
                pl.BlockSpec((1, block_kv, d_pad), kv_map),
            ],
            out_specs=pl.BlockSpec(
                (1, group, block_q, d_pad),
                lambda h, i, t, first, last: (h, 0, i, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((NUM_SUBLANES, group * block_q), jnp.float32),
                pltpu.VMEM((NUM_SUBLANES, group * block_q), jnp.float32),
                pltpu.VMEM((d_pad, group * block_q), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((hkv, group, tq_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        debug=debug,
        name="flash_attention_varlen",
    )(
        first_blk, last_blk,
        q_segment_ids[None], q_bounds[None],
        kv_segment_ids[None], kv_positions[None],
        qg, k, v,
    )

    out = out.reshape(hq, tq_pad, d_pad)
    if tq_pad != tq or d_pad != d:
        out = out[:, :tq, :d]
    return out


def _seg_metadata(cu: jax.Array, total: int):
    """cu_seqlens [N+1] -> (segment_ids [T], positions [T]) inside jit."""
    t = jnp.arange(total, dtype=jnp.int32)
    seg = jnp.searchsorted(cu[1:], t, side="right").astype(jnp.int32)
    pos = t - cu[seg]
    return seg, pos


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "window", "logit_softcap", "equal_lengths",
        "max_seqlen", "block_q", "block_kv", "stable", "interpret", "debug",
    ),
)
def flash_attention_varlen(
    q: jax.Array,  # [Tq, Hq, D] packed tokens
    k: jax.Array,  # [Tkv, Hkv, D]
    v: jax.Array,
    cu_seqlens_q: jax.Array,  # [num_seqs + 1] int32
    cu_seqlens_kv: jax.Array | None = None,
    sm_scale: float | None = None,
    causal: bool = False,
    window: int | None = None,
    logit_softcap: float | None = None,
    equal_lengths: bool = False,
    max_seqlen: int = 0,
    block_q: int = 0,
    block_kv: int = 0,
    stable: bool | str = True,
    interpret: bool = False,
    debug: bool = False,
) -> jax.Array:
    """Varlen attention over packed ragged batches (flash-attn layout).

    Args:
      q: [total_q_tokens, Hq, D] — sequences concatenated along axis 0.
      k, v: [total_kv_tokens, Hkv, D].
      cu_seqlens_q / cu_seqlens_kv: exclusive-prefix-sum boundaries
        ([0, len_0, len_0+len_1, ...]); kv defaults to q's (self-attention
        packing).
      causal: per-sequence bottom-right-aligned causality
        (reference: csrc/mask.cuh:37-39).
      window: per-sequence sliding window (HF semantics).
      equal_lengths: promise that every sequence has q_len == kv_len,
        enabling global-diagonal tile skipping (pass True for standard
        prefill packing; also implied when cu_seqlens_kv is None).

    Returns: [total_q_tokens, Hq, D] in q's dtype.
    """
    tq = q.shape[0]
    tkv = k.shape[0]
    if cu_seqlens_kv is None:
        cu_seqlens_kv = cu_seqlens_q
        equal_lengths = True
    cu_q = cu_seqlens_q.astype(jnp.int32)
    cu_kv = cu_seqlens_kv.astype(jnp.int32)

    seg_q, pos_q = _seg_metadata(cu_q, tq)
    seg_kv, pos_kv = _seg_metadata(cu_kv, tkv)
    # Bottom-right causal bound of each q token: pos + (kv_len - q_len).
    len_q = jnp.diff(cu_q)
    len_kv = jnp.diff(cu_kv)
    offset = (len_kv - len_q).astype(jnp.int32)
    q_bounds = pos_q + offset[seg_q]

    out = flash_attention_packed(
        jnp.swapaxes(q, 0, 1),
        jnp.swapaxes(k, 0, 1),
        jnp.swapaxes(v, 0, 1),
        q_segment_ids=seg_q,
        kv_segment_ids=seg_kv,
        q_bounds=q_bounds,
        kv_positions=pos_kv,
        sm_scale=sm_scale,
        causal=causal,
        window=window,
        logit_softcap=logit_softcap,
        equal_lengths=equal_lengths,
        max_seqlen=max_seqlen,
        block_q=block_q,
        block_kv=block_kv,
        stable=stable,
        interpret=interpret,
        debug=debug,
    )
    return jnp.swapaxes(out, 0, 1)
