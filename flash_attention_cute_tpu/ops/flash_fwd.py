"""Fused flash-attention forward Pallas kernel (prefill path).

TPU-native re-design of the reference CUDA kernel
(reference: csrc/flash_attention_template.cuh:138-564 `flash_attention_v2`,
csrc/mask.cuh:30-88 `Mask`):

  * grid (batch, kv_head, q_block, kv_block) replaces the CUDA grid
    (q_tiles, heads, batch) + in-kernel KV loop; the kv dimension is marked
    "arbitrary" so Mosaic keeps it sequential (it is the online-softmax
    reduction) while batch/head/q-tile dims parallelize.
  * GQA q-head-group packing IN PREFILL: the whole group of G = Hq/Hkv query
    heads rides in one grid cell, so each K/V block streams from HBM once
    per group instead of once per q head (G-fold HBM traffic cut). The
    reference packs heads only for decode (csrc/flash_attention_api.cpp:72-83);
    extending it to prefill is a TPU-first improvement enabled by VMEM size.
  * TRANSPOSED compute layout: the kernel computes S^T = K Q^T and keeps the
    accumulator as O^T = [d, block_q], so every online-softmax statistic
    (running max, running sum, rescale factor) is a (1, block_q) LANE vector
    instead of a (block_q, 128) tile. Ablation on v5e
    (benchmarks/ablate_flash.py) showed those row-stat tile ops were the
    dominant per-step cost; transposing makes throughput nearly independent
    of the KV block size, which in turn lets causal runs use small KV blocks
    for fine-grained diagonal skipping. One O^T -> O transpose per q-block
    amortizes to nothing. (The CUDA reference gets the same effect from
    warp-register layouts + shuffles, template.cuh:445-487 — registers have
    no lane-padding tax; on TPU the layout must be chosen explicitly.)
  * Pallas' automatic pipelining double-buffers the K/V HBM->VMEM block
    copies, replacing the hand-rolled cp.async two-stage pipeline
    (reference: flash_attention_template.cuh:323-385).
  * Online softmax in base 2: the host folds softmax_scale * log2(e) into Q
    once (exactly the reference's trick, csrc/flash_attention_api.cpp:87 +
    exp2f at template.cuh:445-487), so the inner loop spends no VPU ops on
    scaling and uses the cheaper exp2.
  * Bottom-right-aligned causal masking via a per-cell additive bias tile
    built under lax.cond only for diagonal-straddling blocks and shared by
    all G heads of the group (replaces the per-thread TV-layout inverse of
    mask.cuh:7-27; fixes the reference's own mask-perf TODO, README.md:19).
    Whole KV blocks past the diagonal are skipped (mask.cuh:45-52).
  * 1/sum normalization deferred to the last KV block with the sum==0 -> 1.0
    guard (replaces template.cuh:516-528); fully-masked rows emit exact 0.

No smem swizzles, no ldmatrix, no V-transpose views: VMEM tiling and the
Mosaic compiler's layout assignment subsume all three.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Finite large-negative mask value: -inf breaks the online softmax when a row
# is fully masked within a visited block (exp(-inf - (-inf)) = NaN).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# Running-max values at or below this sentinel mean "column not anchored
# yet" (no live score seen): real scores cannot reach this scale without
# the inputs themselves overflowing f32. Masked entries (DEFAULT_MASK_VALUE
# plus a finite score) always sit below it.
UNANCHORED = 0.5 * DEFAULT_MASK_VALUE

# Lane count: the minor dimension of every VPU/VMEM tile.
NUM_LANES = 128

# Sublane count for fp32 tiles; stat scratch rows.
NUM_SUBLANES = 8

LOG2E = math.log2(math.e)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _quantize_k_rows(k_sub):
    """Per-ROW symmetric int8 quantization of a K sub-block (the natural
    sublane vector; one scale per key). Returns (ki8, row_scales)."""
    k_f32 = k_sub.astype(jnp.float32)
    babs = jnp.max(jnp.abs(k_f32), axis=1, keepdims=True)
    bsc = jnp.where(babs == 0.0, 1.0, babs)
    ki8 = jnp.clip(
        jnp.round(k_f32 * (127.0 / bsc)), -127.0, 127.0
    ).astype(jnp.int8)
    return ki8, bsc


def _int8_scores(ki8, bsc, q_i8, qa):
    """S^T = K Q^T on the MXU's 2x int8 path, reconstructed exactly for
    the quantized values: s = i32 * (b_row/127) * (a/127) — `qa` already
    carries a/127 (see the fused kernel's q-quantization)."""
    s_i32 = jax.lax.dot_general(
        ki8, q_i8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return s_i32.astype(jnp.float32) * (bsc * (qa * (1.0 / 127.0)))


def _flash_fwd_kernel(
    q_ref,  # [1, 1, g, block_q, d] — packed q-head group (pre-scaled)
    k_ref,  # [1, 1, block_kv, d]
    v_ref,  # [1, 1, block_kv, d]
    o_ref,  # [1, 1, g, block_q, d]
    m_scratch,  # [g, NUM_SUBLANES, block_q] f32 (row 0 live)
    l_scratch,  # [g, NUM_SUBLANES, block_q] f32 (row 0 live)
    acc_scratch,  # [g, d, block_q] f32 — O^T accumulator
    *,
    causal: bool,
    window: int | None,
    group: int,
    block_q: int,
    block_kv: int,
    q_len: int,  # real (unpadded) query length
    kv_len: int,  # real (unpadded) key/value length
    kv_len_padded: int,
    mask_value: float,
    lse_ref=None,  # [1, 1, g, block_q] f32 — log2-sum-exp residual (bwd)
):
    q_blk = pl.program_id(2)
    kv_blk = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)

    @pl.when(kv_blk == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Bottom-right-aligned causal: coord (m, n) allowed iff
    # n <= m + (kv_len - q_len)   (reference: csrc/mask.cuh:37-39).
    offset = kv_len - q_len
    kv_padded = kv_len_padded != kv_len

    if causal:
        # Skip KV blocks entirely above the diagonal
        # (reference: csrc/mask.cuh:45-52 block-level skip).
        should_run = kv_blk * block_kv <= (q_blk + 1) * block_q - 1 + offset
    else:
        should_run = True
    if window is not None:
        # Sliding window: skip KV blocks entirely below every row's window
        # (row m sees keys n with n > m + offset - window).
        below = (kv_blk + 1) * block_kv - 1 <= q_blk * block_q + offset - window
        should_run = jnp.logical_and(should_run, jnp.logical_not(below))

    @pl.when(should_run)
    def _run():
        k = k_ref[0, 0]  # [block_kv, d]
        v = v_ref[0, 0]

        # Additive mask bias in S^T orientation [block_kv, block_q], built
        # once per grid cell, shared by all G heads (masking depends only on
        # positions). Interior blocks skip construction via lax.cond.
        def build_bias():
            kv_pos = jax.lax.broadcasted_iota(
                jnp.int32, (block_kv, block_q), 0
            ) + kv_blk * block_kv
            allowed = None

            def _and(a, b):
                return b if a is None else a & b

            if causal or window is not None:
                q_pos = jax.lax.broadcasted_iota(
                    jnp.int32, (block_kv, block_q), 1
                ) + q_blk * block_q
            if causal:
                allowed = _and(allowed, kv_pos <= q_pos + offset)
            if window is not None:
                allowed = _and(allowed, kv_pos > q_pos + offset - window)
            if kv_padded or allowed is None:
                allowed = _and(allowed, kv_pos < kv_len)
            return jnp.where(allowed, 0.0, mask_value).astype(jnp.float32)

        needs_mask = False
        if causal:
            # Block straddles the upper (causal) diagonal.
            needs_mask = (kv_blk + 1) * block_kv - 1 > q_blk * block_q + offset
        if window is not None:
            # Block straddles some row's lower window edge.
            lower = (
                kv_blk * block_kv
                <= q_blk * block_q + block_q - 1 + offset - window
            )
            needs_mask = lower if needs_mask is False else needs_mask | lower
        if kv_padded:
            last = kv_blk == num_kv_blocks - 1
            needs_mask = last if needs_mask is False else needs_mask | last

        if needs_mask is not False:
            bias = jax.lax.cond(
                needs_mask,
                build_bias,
                lambda: jnp.zeros((block_kv, block_q), jnp.float32),
            )
        else:
            bias = None

        for g in range(group):
            q = q_ref[0, 0, g]  # [block_q, d]

            # S^T = K Q^T on the MXU, fp32 accumulation; scores arrive in
            # log2 units (host pre-scaled Q by softmax_scale * log2e).
            s_t = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [block_kv, block_q]
            if bias is not None:
                s_t += bias

            # Online softmax: all statistics are (1, block_q) lane vectors.
            m_prev = m_scratch[g][:1]  # [1, block_q]
            l_prev = l_scratch[g][:1]
            m_curr = jnp.max(s_t, axis=0, keepdims=True)  # [1, block_q]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p_t = jnp.exp2(s_t - m_next)  # sublane broadcast
            l_next = alpha * l_prev + jnp.sum(p_t, axis=0, keepdims=True)

            m_scratch[g] = jnp.broadcast_to(m_next, m_scratch.shape[1:])
            l_scratch[g] = jnp.broadcast_to(l_next, l_scratch.shape[1:])

            # O^T accumulator: rescale is a lane-broadcast multiply; the
            # new contribution is V^T P^T, again a single MXU op.
            acc_scratch[g] *= alpha
            acc_scratch[g] += jax.lax.dot_general(
                v, p_t.astype(v.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [d, block_q]

    @pl.when(kv_blk == num_kv_blocks - 1)
    def _store():
        # Deferred normalization; sum==0 -> scale 1.0 so fully-masked rows
        # (all KV blocks skipped) emit exactly 0
        # (reference: template.cuh:520-528 guard).
        if causal and offset < 0:
            # q_len > kv_len: rows m < -offset are fully masked under
            # bottom-right alignment. When such a row shares a *visited*
            # block with valid rows, its l is polluted by
            # exp2(mask_value - mask_value) == 1 terms — force exact zeros
            # (reference semantics: csrc/flash_attention_template.cuh:520-528).
            q_pos = jax.lax.broadcasted_iota(
                jnp.int32, (1, block_q), 1
            ) + q_blk * block_q
            dead = q_pos + offset < 0  # [1, block_q]
        else:
            dead = None
        for g in range(group):
            l = l_scratch[g][:1]  # [1, block_q]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            if dead is not None:
                l_inv = jnp.where(dead, 0.0, l_inv)
            o_t = acc_scratch[g] * l_inv  # [d, block_q]
            o_ref[0, 0, g] = o_t.T.astype(o_ref.dtype)
            if lse_ref is not None:
                # Residual for the backward: log2-sum-exp of the (scaled,
                # log2-unit) scores. +inf for empty/fully-masked rows so
                # the backward's exp2(s - lse) is exactly 0 there.
                lse = m_scratch[g][:1] + jnp.log2(l)
                lse = jnp.where(l == 0.0, jnp.inf, lse)
                if dead is not None:
                    lse = jnp.where(dead, jnp.inf, lse)
                lse_ref[0, 0, g : g + 1] = lse


def _flash_fwd_kernel_fused(
    q_ref,  # [1, 1, g, block_q, d] — packed q-head group (pre-scaled)
    k_ref,  # [1, 1, block_kv, d]
    v_ref,  # [1, 1, block_kv, d]
    o_ref,  # [1, 1, g, block_q, d]
    m_scratch,  # [NUM_SUBLANES, g * block_q] f32 (row 0 live)
    l_scratch,  # [NUM_SUBLANES, g * block_q] f32 (row 0 live)
    acc_scratch,  # [d, g * block_q] f32 — O^T accumulator
    qi8_scratch=None,  # [g * block_q, d] int8 — quantized q (score_dtype)
    qa_scratch=None,  # [1, 1] f32 SMEM — q dequant scale (score_dtype)
    *,
    causal: bool,
    window: int | None,
    group: int,
    block_q: int,
    block_kv: int,
    q_len: int,
    kv_len: int,
    kv_len_padded: int,
    mask_value: float,
    inner: int = 1,
    stable: bool | str = True,
    logit_softcap: float | None = None,
    mask_inline: bool = False,
    score_dtype=None,  # jnp.int8: run QK^T on the int8 MXU path (2x rate)
    lse_ref=None,  # [1, 1, g, block_q] f32 — log2-sum-exp residual (bwd)
    clamp_ref=None,  # [1, 1, 1, 1] f32 — lazy-envelope saturation count
):
    """Fused-group variant: the whole G-head group rides in ONE pair of MXU
    ops per KV block — S^T = K (Qg)^T is [block_kv, G*block_q] — instead of
    G narrow matmuls. Wider N amortizes MXU pipeline overhead; the mask
    bias is built once at block_q width and lane-tiled across the group
    (masking depends only on positions, not heads).

    `inner` splits the KV block into sub-blocks processed back to back in
    one invocation: the unrolled dataflow exposes sub-block i+1's QK^T
    matmul as independent of sub-block i's softmax, letting the Mosaic
    scheduler overlap MXU and VPU work (the TPU analog of the reference's
    two-stage gemm/softmax pipeline, template.cuh:363-373/507-514)."""
    q_blk = pl.program_id(2)
    kv_blk = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)
    assert block_kv % inner == 0
    sub_kv = block_kv // inner

    @pl.when(kv_blk == 0)
    def _init():
        # -inf init is exact for every stable mode: sub-block 0 of each KV
        # block runs the strict branch, which anchors the running max at
        # that sub-block's true (finite) maximum before any lazy exp2
        # references it. (A 0.0 init — used in round 2 — additionally
        # underflowed rows whose max scaled score sits below ~-126
        # log2-units to exact zeros; -inf has no such edge.)
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    offset = kv_len - q_len
    kv_padded = kv_len_padded != kv_len

    if clamp_ref is not None:
        @pl.when(jnp.logical_and(q_blk == 0, kv_blk == 0))
        def _init_clamp():
            # (1, 1)-shaped store: Mosaic rejects scalar stores to VMEM.
            clamp_ref[0, 0] = jnp.zeros((1, 1), jnp.float32)

    if score_dtype is not None:
        # Opt-in int8 QK^T: quantize the (pre-scaled) q tile ONCE per grid
        # row with a single tile-wide scale (kept scalar so the dequant is
        # a sublane-broadcast multiply — no cross-lane transpose of
        # per-row scales; row maxima of a scaled-normal q concentrate
        # within ~2x of the tile max, so per-row q scales buy < 1 extra
        # bit). K quantizes per ROW per sub-block (natural sublane
        # vector). Score reconstruction is exact for the quantized
        # values: s = i32 * (b_row/127) * (a/127).
        @pl.when(kv_blk == 0)
        def _quantize_q():
            q_full = q_ref[0, 0].reshape(group * block_q, q_ref.shape[-1])
            q_f32 = q_full.astype(jnp.float32)
            a = jnp.max(jnp.abs(q_f32))
            a = jnp.where(a == 0.0, 1.0, a)
            qa_scratch[0, 0] = a * (1.0 / 127.0)
            qi8_scratch[...] = jnp.clip(
                jnp.round(q_f32 * (127.0 / a)), -127.0, 127.0
            ).astype(jnp.int8)

    if causal:
        should_run = kv_blk * block_kv <= (q_blk + 1) * block_q - 1 + offset
    else:
        should_run = True
    if window is not None:
        below = (kv_blk + 1) * block_kv - 1 <= q_blk * block_q + offset - window
        should_run = jnp.logical_and(should_run, jnp.logical_not(below))

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0].reshape(group * block_q, q_ref.shape[-1])

        for si in range(inner):
            sub_start = kv_blk * block_kv + si * sub_kv

            def build_bias(sub_start=sub_start):
                kv_pos = jax.lax.broadcasted_iota(
                    jnp.int32, (sub_kv, block_q), 0
                ) + sub_start
                allowed = None

                def _and(a, b):
                    return b if a is None else a & b

                if causal or window is not None:
                    q_pos = jax.lax.broadcasted_iota(
                        jnp.int32, (sub_kv, block_q), 1
                    ) + q_blk * block_q
                if causal:
                    allowed = _and(allowed, kv_pos <= q_pos + offset)
                if window is not None:
                    allowed = _and(allowed, kv_pos > q_pos + offset - window)
                if kv_padded or allowed is None:
                    allowed = _and(allowed, kv_pos < kv_len)
                bias = jnp.where(allowed, 0.0, mask_value).astype(jnp.float32)
                return jnp.tile(bias, (1, group))  # head-major lane packing

            needs_mask = False
            if causal:
                needs_mask = (
                    sub_start + sub_kv - 1 > q_blk * block_q + offset
                )
            if window is not None:
                lower = (
                    sub_start
                    <= q_blk * block_q + block_q - 1 + offset - window
                )
                needs_mask = (
                    lower if needs_mask is False else needs_mask | lower
                )
            if kv_padded:
                last = sub_start + sub_kv > kv_len
                needs_mask = (
                    last if needs_mask is False else needs_mask | last
                )

            k = k_ref[0, 0, si * sub_kv : (si + 1) * sub_kv]
            v = v_ref[0, 0, si * sub_kv : (si + 1) * sub_kv]
            if score_dtype is not None:
                ki8, bsc = _quantize_k_rows(k)
                s_t = _int8_scores(
                    ki8, bsc, qi8_scratch[...], qa_scratch[0, 0]
                )  # [sub_kv, group * block_q]
            else:
                s_t = jax.lax.dot_general(
                    k, q, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [sub_kv, group * block_q]
            if logit_softcap is not None:
                # Scores are in log2 units (Q pre-folded scale*log2e), so
                # the cap scales by log2e too: log2e*c*tanh(s/(log2e*c))
                # == log2e * (c*tanh(s_nat/c)). Applied pre-mask.
                cap2 = logit_softcap * LOG2E
                s_t = jnp.tanh(s_t * (1.0 / cap2)) * cap2
            if needs_mask is not False:
                if mask_inline:
                    # Straight-line bias build: measured +8% on v5e when
                    # most computed blocks straddle the diagonal (short S)
                    # — lax.cond itself serializes Mosaic's cross-sub-block
                    # pipeline. The wrapper picks this statically when the
                    # straddle fraction of the causal geometry is high.
                    s_t += build_bias()
                else:
                    s_t += jax.lax.cond(
                        needs_mask,
                        build_bias,
                        lambda: jnp.zeros(
                            (sub_kv, group * block_q), jnp.float32
                        ),
                    )

            if stable == "strict" or (stable is True and si == 0):
                # Classic FA2 chain: the current block's max gates p, so
                # the max tree and the acc rescale sit ON the QK->exp2->PV
                # critical path (measured -10..-20 TF/s vs lazy on v5e).
                # Always exact; keep for adversarial inputs.
                #
                # Per-column ANCHORING (round 3): the running max starts at
                # -inf ("unanchored"); a column's first live score anchors
                # it at that sub-block's TRUE max (alpha washes any prior
                # masked-pollution to exact 0), so the lazy branch below
                # references real score scale — no 0.0-init negative-
                # underflow edge (round-2 advisor finding), and deeply
                # negative rows stay exact. Columns with no live score yet
                # (m_next still <= UNANCHORED) contribute exact 0.
                m_prev = m_scratch[:1]
                l_prev = l_scratch[:1]
                m_curr = jnp.max(s_t, axis=0, keepdims=True)
                unanchored = m_prev <= UNANCHORED
                m_next = jnp.where(
                    unanchored, m_curr, jnp.maximum(m_prev, m_curr)
                )
                alpha = jnp.where(
                    unanchored, 0.0, jnp.exp2(m_prev - m_next)
                )
                p_t = jnp.exp2(s_t - m_next)
                # Dead-so-far columns (m_next at mask scale): zero p so
                # they never pollute l/acc (exp2(mask - mask) == 1).
                p_t = jnp.where(m_next <= UNANCHORED, 0.0, p_t)
                p_op = p_t.astype(v.dtype)  # PV matmul operand
                # (An MXU ones-row matmul for this sum measured ~7% SLOWER
                # than the VPU reduction — the extra matmul serializes on
                # the MXU while Mosaic overlaps the VPU tree with PV.)
                l_next = alpha * l_prev + jnp.sum(p_t, axis=0, keepdims=True)

                m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
                l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

                acc_scratch[...] *= alpha
                acc_scratch[...] += jax.lax.dot_general(
                    v, p_op, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [d, group * block_q]
            elif stable:
                # stable=True — LAZY running max (the round-2 overlap fix,
                # benchmarks/experiment_probe.py): p is referenced to the
                # max from BEFORE this sub-block, which is known before the
                # QK^T matmul finishes, so the critical path is just
                # QK -> exp2 -> PV; the max tree, alpha, and the acc
                # rescale all overlap the matmuls (measured: softmax cost
                # fully hidden — 140 vs 120 TF/s non-causal on v5e).
                # Exactness: the reference point cancels in o = acc / l;
                # the clamp only guards f32 exp2 overflow. Sub-block 0 of
                # every KV block runs the strict branch above, anchoring
                # the running max at that block's own maximum — so results
                # are exact unless a LATER sub-block of the same KV block
                # exceeds that anchor by > 110 log2-units (~76 nats of
                # within-block spread; random-init test models with
                # +-120-nat logits pass, trained models are far inside).
                # Beyond it the row saturates gracefully (no NaN).
                m_prev = m_scratch[:1]
                # Columns not yet anchored by a strict sub-block (only
                # possible under window/masked-start geometries, where a
                # column's first live score can appear at a lazy
                # sub-block) fall back to reference 0 — the round-2
                # envelope — instead of the mask-scale sentinel, which
                # would saturate every live score at the +110 clamp.
                m_ref = jnp.where(m_prev <= UNANCHORED, 0.0, m_prev)
                delta = s_t - m_ref
                p_t = jnp.exp2(jnp.minimum(delta, 110.0))
                p_op = p_t.astype(v.dtype)
                if clamp_ref is not None:
                    # Saturation-event counter: scores beyond the +110
                    # log2-unit lazy envelope (where the clamp engaged and
                    # the result degraded). A plain VPU reduction off the
                    # QK->exp2->PV critical path — it does not gate p.
                    clamp_ref[0, 0] += jnp.sum(
                        (delta > 110.0).astype(jnp.float32)
                    ).reshape(1, 1)
                l_tmp = l_scratch[:1] + jnp.sum(p_t, axis=0, keepdims=True)
                row_max = jnp.max(s_t, axis=0, keepdims=True)
                # Keep fully-masked-so-far columns unanchored (sentinel);
                # anchor at max(0, row_max) once a live score appears.
                m_next = jnp.where(
                    row_max <= UNANCHORED,
                    m_prev,
                    jnp.maximum(m_ref, row_max),
                )
                alpha = jnp.where(
                    m_next <= UNANCHORED, 1.0, jnp.exp2(m_ref - m_next)
                )
                m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
                l_scratch[...] = jnp.broadcast_to(
                    l_tmp * alpha, l_scratch.shape
                )
                # Accumulate in the OLD units first, then rescale both acc
                # and l to the new reference — the rescale overlaps the
                # next sub-block's QK^T.
                acc_scratch[...] += jax.lax.dot_general(
                    v, p_op, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_scratch[...] *= alpha
            else:
                # stable=False: skip the running max entirely — exp2 of the
                # raw (log2-scaled) scores. f32 holds exp2(s) for s < 128,
                # i.e. logits < 88.7 nats: safe for trained models, opt-in.
                # mask_value is huge-negative: exp2 -> exact 0, no NaN path.
                p_t = jnp.exp2(s_t)
                p_op = p_t.astype(v.dtype)
                l_next = l_scratch[:1] + jnp.sum(p_t, axis=0, keepdims=True)
                l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
                acc_scratch[...] += jax.lax.dot_general(
                    v, p_op, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    @pl.when(kv_blk == num_kv_blocks - 1)
    def _store():
        if causal and offset < 0:
            q_pos = jax.lax.broadcasted_iota(
                jnp.int32, (1, block_q), 1
            ) + q_blk * block_q
            dead = jnp.tile(q_pos + offset < 0, (1, group))
        else:
            dead = None
        l = l_scratch[:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        if dead is not None:
            l_inv = jnp.where(dead, 0.0, l_inv)
        o_t = acc_scratch[...] * l_inv  # [d, g * block_q]
        d_pad = acc_scratch.shape[0]
        o_ref[0, 0] = (
            o_t.T.reshape(group, block_q, d_pad).astype(o_ref.dtype)
        )
        if lse_ref is not None:
            # Backward residual in log2 units of the scaled scores; with
            # stable=False there is no running max, so lse = log2(l) (the
            # backward's exp2(s - lse) = exp2(s)/l still holds). +inf for
            # empty / fully-masked rows -> backward p is exactly 0.
            if stable:
                lse = m_scratch[:1] + jnp.log2(l)
            else:
                lse = jnp.log2(l)
            lse = jnp.where(l == 0.0, jnp.inf, lse)
            if dead is not None:
                lse = jnp.where(dead, jnp.inf, lse)
            lse_ref[0, 0] = lse.reshape(group, block_q)


def _flash_fwd_kernel_diag(
    qmap_ref,  # [nsteps] int32 scalar-prefetch: q block of each flat step
    kvmap_ref,  # [nsteps] int32 scalar-prefetch: kv block of each flat step
    q_ref,  # [1, 1, g, block, d]  head-major (production layout)
    k_ref,  # [1, 1, block, d]
    v_ref,  # [1, 1, block, d]
    o_ref,  # [1, 1, g, block, d]
    m_scratch,  # [NUM_SUBLANES, g * block] f32
    l_scratch,  # [NUM_SUBLANES, g * block] f32
    acc_scratch,  # [d, g * block] f32 — O^T accumulator
    qi8_scratch=None,  # [g * block, d] int8 — quantized q (score_dtype)
    qa_scratch=None,  # [1, 1] f32 SMEM — q dequant scale (score_dtype)
    *,
    group: int,
    block: int,
    q_len: int,
    kv_len: int,
    kv_len_padded: int,
    off_blocks: int,  # (kv_len - q_len) // block, >= 0
    mask_value: float,
    inner: int,
    fused_subs: int,  # diag sub-blocks si < fused_subs run fused full-width
    score_dtype=None,  # jnp.int8: QK^T on the int8 MXU path (2x rate)
):
    """DIAG-FIRST causal kernel (round 3, the headline-perf redesign).

    FLAT-grid (round 3b): the grid's last axis enumerates ONLY the live
    (q_block, kv_block) pairs, q-major with each row's diagonal first —
    per-step block indices arrive via scalar prefetch (qmap/kvmap). The
    round-3a rectangular grid spent ~0.5 us per DEAD step (DMA-clamped,
    `pl.when`-skipped) — 1/4 of all steps at the S=1024/512-tile headline;
    flat enumeration removes them entirely (measured +9-10%: 81-83 ->
    88-91 TF/s, benchmarks/experiment_flatgrid.py). Per q row the walk
    is diagonal (straddle) block first, then interiors DESCENDING to kv
    block 0. Then:

      * interior steps (every non-diagonal step of a row's walk) are
        completely mask-free straight-line fused wide matmuls — no bias
        build, no lax.cond;
      * the diagonal step is a hybrid: sub-blocks si < fused_subs run the
        fused full-width matmul with a straight-line bias (their live-q
        fraction is high), later sub-blocks run a PER-HEAD loop whose
        operands slice each head's contiguous live-q suffix [si*sub :] —
        in head-major layout the nested suffixes exactly encode the
        triangle, skipping the dead FLOPs with zero conditionals.

    Requires block_q == block_kv and (kv_len - q_len) % block == 0 with
    kv_len >= q_len (the prefill case); the wrapper falls back to the
    general kernel otherwise. v5e, B16 Hq64 Hkv8 S1024 D128 bf16 causal:
    72.4 (round-2 kernel) -> 85 TF/s; S=4096 B4 Hq32: 100 -> 127 TF/s
    (benchmarks/experiment_diag2.py ablation: descending-order structure
    alone 75.8, + per-head sliced diag 80-84, fused_subs=2 best).

    Softmax: anchored-lazy with the -inf/UNANCHORED sentinel scheme of the
    fused kernel. Because the diagonal step runs FIRST and kv row 0 is
    visible to every query (offset >= 0), every column anchors at its true
    max in the very first strict sub-block.
    """
    t = pl.program_id(2)
    i = qmap_ref[t]  # q block of this flat step
    kvj = kvmap_ref[t]  # kv block of this flat step
    # Row boundaries fall out of the walk order: each row starts at its
    # diagonal block and descends to kv block 0.
    first = kvj == i + off_blocks
    last = kvj == 0
    sub = block // inner
    offset = kv_len - q_len
    kv_padded = kv_len_padded != kv_len

    @pl.when(first)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    if score_dtype is not None:
        # Quantize the (pre-scaled) q tile once per grid row with a single
        # tile-wide scale (same scheme as the fused kernel — see the
        # rationale there); the diagonal's per-head suffix slices read
        # rows of this scratch directly.
        @pl.when(first)
        def _quantize_q():
            q_full = q_ref[0, 0].reshape(group * block, q_ref.shape[-1])
            q_f32 = q_full.astype(jnp.float32)
            a = jnp.max(jnp.abs(q_f32))
            a = jnp.where(a == 0.0, 1.0, a)
            qa_scratch[0, 0] = a * (1.0 / 127.0)
            qi8_scratch[...] = jnp.clip(
                jnp.round(q_f32 * (127.0 / a)), -127.0, 127.0
            ).astype(jnp.int8)

    def scores(k_i8_bsc, q_rows_lo, q_rows_hi, k_sub, q_slice):
        """S^T for one sub-block: int8 MXU path when score_dtype is set
        (q rows [q_rows_lo:q_rows_hi) of the quantized scratch), else the
        native-dtype matmul on (k_sub, q_slice)."""
        if score_dtype is not None:
            ki8, bsc = k_i8_bsc
            return _int8_scores(
                ki8, bsc, qi8_scratch[q_rows_lo:q_rows_hi, :],
                qa_scratch[0, 0],
            )
        return jax.lax.dot_general(
            k_sub, q_slice, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def softmax_update(s_t, lo, v_blk, strict):
        """Online softmax + accumulate on the lane slice [lo : lo + w).

        Same anchored-sentinel math as _flash_fwd_kernel_fused: strict
        anchors unanchored columns at this sub-block's true max with a
        washing alpha; lazy references the anchor (or 0 for the
        window-less diag-first geometry this never triggers)."""
        w = s_t.shape[1]
        hi = lo + w
        m_prev = m_scratch[:1, lo:hi]
        if strict:
            m_curr = jnp.max(s_t, axis=0, keepdims=True)
            unanchored = m_prev <= UNANCHORED
            m_next = jnp.where(
                unanchored, m_curr, jnp.maximum(m_prev, m_curr)
            )
            alpha = jnp.where(unanchored, 0.0, jnp.exp2(m_prev - m_next))
            p_t = jnp.exp2(s_t - m_next)
            p_t = jnp.where(m_next <= UNANCHORED, 0.0, p_t)
            p_op = p_t.astype(v_blk.dtype)
            l_next = alpha * l_scratch[:1, lo:hi] + jnp.sum(
                p_t, axis=0, keepdims=True
            )
            m_scratch[:, lo:hi] = jnp.broadcast_to(m_next, (NUM_SUBLANES, w))
            l_scratch[:, lo:hi] = jnp.broadcast_to(l_next, (NUM_SUBLANES, w))
            acc_scratch[:, lo:hi] *= alpha
            acc_scratch[:, lo:hi] += jax.lax.dot_general(
                v_blk, p_op, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_ref = jnp.where(m_prev <= UNANCHORED, 0.0, m_prev)
            p_t = jnp.exp2(jnp.minimum(s_t - m_ref, 110.0))
            p_op = p_t.astype(v_blk.dtype)
            l_tmp = l_scratch[:1, lo:hi] + jnp.sum(
                p_t, axis=0, keepdims=True
            )
            row_max = jnp.max(s_t, axis=0, keepdims=True)
            m_next = jnp.where(
                row_max <= UNANCHORED, m_prev, jnp.maximum(m_ref, row_max)
            )
            alpha = jnp.where(
                m_next <= UNANCHORED, 1.0, jnp.exp2(m_ref - m_next)
            )
            m_scratch[:, lo:hi] = jnp.broadcast_to(m_next, (NUM_SUBLANES, w))
            l_scratch[:, lo:hi] = jnp.broadcast_to(
                l_tmp * alpha, (NUM_SUBLANES, w)
            )
            acc_scratch[:, lo:hi] += jax.lax.dot_general(
                v_blk, p_op, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scratch[:, lo:hi] *= alpha

    @pl.when(first)
    def _diag_step():
        for si in range(inner):
            fused_this = si < fused_subs
            start = 0 if fused_this else si * sub
            k_sub = k_ref[0, 0, si * sub : (si + 1) * sub]
            v_sub = v_ref[0, 0, si * sub : (si + 1) * sub]
            # Straight-line bias at full block width (this step always
            # straddles the diagonal), shared by all heads; suffix-sliced
            # for the per-head sub-blocks.
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, (sub, block), 0) + (
                (i + off_blocks) * block + si * sub
            )
            q_pos = jax.lax.broadcasted_iota(jnp.int32, (sub, block), 1) + (
                i * block
            )
            allowed = kv_pos <= q_pos + offset
            if kv_padded:
                allowed &= kv_pos < kv_len
            bias = jnp.where(allowed, 0.0, mask_value).astype(jnp.float32)
            kq = (
                _quantize_k_rows(k_sub) if score_dtype is not None else None
            )
            if fused_this:
                q_all = q_ref[0, 0].reshape(block * group, q_ref.shape[-1])
                s_t = scores(
                    kq, 0, group * block, k_sub, q_all
                )  # [sub, group * block]
                s_t += jnp.tile(bias, (1, group))
                softmax_update(s_t, 0, v_sub, strict=(si == 0))
            else:
                for g in range(group):
                    q_g = q_ref[0, 0, g, start:, :]  # [block - start, d]
                    s_t = scores(
                        kq, g * block + start, (g + 1) * block, k_sub, q_g
                    )  # [sub, block - start]
                    s_t += bias[:, start:]
                    softmax_update(
                        s_t, g * block + start, v_sub, strict=(si == 0)
                    )

    @pl.when(jnp.logical_not(first))
    def _interior_step():
        q_all = q_ref[0, 0].reshape(block * group, q_ref.shape[-1])
        for si in range(inner):
            k_sub = k_ref[0, 0, si * sub : (si + 1) * sub]
            v_sub = v_ref[0, 0, si * sub : (si + 1) * sub]
            kq = (
                _quantize_k_rows(k_sub) if score_dtype is not None else None
            )
            s_t = scores(kq, 0, group * block, k_sub, q_all)
            softmax_update(s_t, 0, v_sub, strict=(si == 0))

    @pl.when(last)
    def _store():
        l = l_scratch[:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_t = acc_scratch[...] * l_inv  # [d, g * block]
        d_pad = acc_scratch.shape[0]
        o_ref[0, 0] = (
            o_t.T.reshape(group, block, d_pad).astype(o_ref.dtype)
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "window", "block_q", "block_kv",
        "fuse_group", "inner_splits", "stable", "logit_softcap",
        "score_dtype",
        "return_lse", "return_clamps", "diag_fused_subs",
        "interpret", "debug",
    ),
)
def flash_attention_fwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: float | None = None,
    causal: bool = False,
    window: int | None = None,
    block_q: int = 0,
    block_kv: int = 0,
    fuse_group: bool | None = None,
    inner_splits: int = 0,
    stable: bool | str = True,
    logit_softcap: float | None = None,
    score_dtype: str | None = None,  # "int8": QK^T on the int8 MXU path
    # (2x matmul rate; per-KV-row + tile-scalar-q scales; ~1e-2 output
    # error vs bf16 scores — an OPT-IN speed/accuracy trade)
    return_lse: bool = False,
    return_clamps: bool = False,
    diag_fused_subs: int = 0,  # diag-first tuning: sub-blocks < this run
    # fused full-width; 0 = auto (inner_splits // 2, the v5e optimum)
    interpret: bool = False,
    debug: bool = False,
) -> jax.Array:
    """Flash-attention forward for prefill.

    Args:
      q: [B, Hq, Sq, D] bf16/f16/f32
      k: [B, Hkv, Skv, D] with Hq % Hkv == 0 (GQA/MQA: the whole q-head
         group is packed into one grid cell)
      v: [B, Hkv, Skv, D]
      sm_scale: defaults to D**-0.5
      causal: bottom-right-aligned causal masking
      window: sliding-window size (HF/Qwen2 semantics — key n visible from
        query position p iff p - window < n; the reference raises on
        sliding windows, models/modeling_qwen2.py:261-269). KV blocks
        entirely below the window are skipped, so cost is O(Sq * window).
      block_q / block_kv: tile sizes; 0 picks tuned defaults (small KV
        blocks for causal — diagonal skipping; larger for full attention).
      fuse_group: compute the whole GQA q-head group in single wide MXU
        ops (S^T is [block_kv, G*block_q]) instead of a per-head loop.
        None = auto (on when the fused tile fits VMEM comfortably).
      stable: softmax stabilization mode.
        True (default) — LAZY running max: p is referenced to the running
          max from before the current sub-block, keeping the max tree and
          rescale off the QK->exp2->PV critical path (+15-25% on v5e).
          Exact unless a score exceeds the previous running max by more
          than 110 log2-units (~76 nats) — then the row saturates
          gracefully (no NaN/inf).
        "strict" — classic FA2 current-block max; exact for any finite
          input; slower.
        False — no running max at all (exp2 of raw scores): fastest, safe
          only while logits stay below ~88 nats; opt-in for trusted data.
      return_lse: additionally return the per-row log2-sum-exp of the
        scaled scores ([B, Hq, Sq] f32, +inf on empty/fully-masked rows) —
        the residual the Pallas backward (ops/flash_bwd.py) needs.
      return_clamps: additionally return a [B, Hkv] f32 count of score
        entries that exceeded the lazy-softmax +110 log2-unit envelope
        (saturation events — 0 means the stable=True result is exact; a
        nonzero count means those rows degraded and `stable='strict'`
        should be used). The counter is a VPU reduction off the
        QK->exp2->PV critical path (measured-overhead line in
        BASELINE.md). Forces the fused kernel; always 0 under
        stable='strict'.

    Returns: [B, Hq, Sq, D] in q's dtype; with return_lse and/or
    return_clamps, a tuple (out, lse?, clamps?) in that order.
    """
    b, hq, sq, d = q.shape
    bk, hkv, skv, dk = k.shape
    assert k.shape == v.shape, (k.shape, v.shape)
    assert b == bk and d == dk, (q.shape, k.shape)
    assert hq % hkv == 0, f"Hq={hq} not a multiple of Hkv={hkv}"
    if sm_scale is None:
        sm_scale = d ** -0.5
    if window is not None:
        assert window > 0, window
        if window >= skv:
            # The window can never bind: the largest global query position
            # is skv-1, so p - window < 0 <= n for every key n — the mask
            # is exactly the (causal) mask without a window. Normalizing
            # here lets short-prompt windowed models (Gemma2/Mistral
            # prompts <= window) take the diag-first fast path.
            window = None
    group = hq // hkv

    # Tuned on v5e (benchmarks/experiment_probe.py, round-2 lazy-max
    # kernel): causal 512x512/4 (fine diagonal granularity), non-causal
    # 512x1024/8 (147 TF/s = 75% MXU vs 119 at the old 1024x512/1).
    if block_q <= 0:
        block_q = 512
    if block_kv <= 0:
        block_kv = 512 if causal else 1024
    inner_splits_requested = inner_splits
    if inner_splits <= 0:
        inner_splits = 4 if causal else 8

    # ---- padding to hardware-friendly shapes ----
    if d <= NUM_LANES:
        d_pad = NUM_LANES
    elif d % NUM_LANES == 0:
        d_pad = d
    else:
        # 128 < D not a lane multiple (e.g. 192): keep the NATIVE head dim
        # as the lane axis instead of padding to the next 128-multiple.
        # Mosaic pads the physical VMEM tile, but HBM blocks, DMAs and the
        # jnp.pad materialization stay at true D. Measured on v5e at D=192
        # S=2048 (benchmarks/experiment_d192.py): non-causal 134.8 vs
        # 115.9 TF/s padded (+16%), causal 85.7 vs 70.7 (+21%) — the
        # round-1 "pads to 256 lanes" waste is gone.
        d_pad = _round_up(d, NUM_SUBLANES)
    block_q = min(block_q, _round_up(sq, NUM_LANES))
    block_kv = min(block_kv, _round_up(skv, NUM_LANES))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_kv)
    # Inner sub-blocks must tile block_kv with >= 8 sublanes each.
    while inner_splits > 1 and (
        block_kv % inner_splits != 0 or block_kv // inner_splits < 8
    ):
        inner_splits -= 1

    # Fold softmax_scale * log2(e) into Q once (reference:
    # csrc/flash_attention_api.cpp:87), in fp32 before any cast.
    q = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)

    if d_pad != d:
        pad = [(0, 0)] * 3 + [(0, d_pad - d)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    if sq_pad != sq:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, sq_pad - sq), (0, 0)])
    if skv_pad != skv:
        pad = [(0, 0), (0, 0), (0, skv_pad - skv), (0, 0)]
        k, v = (jnp.pad(x, pad) for x in (k, v))

    # Pack q-head groups: [B, Hq, S, D] -> [B, Hkv, G, S, D].
    qg = q.reshape(b, hkv, group, sq_pad, d_pad)

    # DIAG-FIRST fast path (round 3): causal prefill with block-aligned
    # bottom-right offset takes the descending-KV hybrid kernel — mask-free
    # interiors + dead-FLOP-skipping diagonal step (see
    # _flash_fwd_kernel_diag). Other configurations (windows, softcap,
    # lse/clamp outputs, strict/off softmax, ragged offsets) keep the
    # general kernel below.
    offset0 = skv - sq
    if score_dtype is not None and score_dtype != "int8":
        raise ValueError(
            f"score_dtype must be 'int8' or None, got {score_dtype!r}"
        )
    if (
        causal
        and window is None
        and logit_softcap is None
        and stable is True
        and not return_lse
        and not return_clamps
        and fuse_group is not False
        and offset0 >= 0
        and block_q == block_kv
        and offset0 % block_q == 0
        and not debug
    ):
        block = block_q
        inner = inner_splits
        diag_bytes = (
            (block // max(inner, 1) + d_pad + NUM_SUBLANES * 2)
            * (group * block) * 4
            + group * block * d_pad * q.dtype.itemsize
        )
        if diag_bytes <= 12 * 1024 * 1024:
            nq = sq_pad // block
            off_blocks = offset0 // block

            # Flat live-step enumeration (see the kernel docstring): per q
            # row, diagonal first then interiors descending to kv block 0.
            # Static Python lists -> device arrays read via scalar prefetch.
            q_of, kv_of = [], []
            for qi_ in range(nq):
                for kj_ in range(qi_ + off_blocks, -1, -1):
                    q_of.append(qi_)
                    kv_of.append(kj_)
            nsteps = len(q_of)
            qmap = jnp.asarray(q_of, jnp.int32)
            kvmap = jnp.asarray(kv_of, jnp.int32)

            kernel = functools.partial(
                _flash_fwd_kernel_diag,
                group=group,
                block=block,
                q_len=sq,
                kv_len=skv,
                kv_len_padded=skv_pad,
                off_blocks=off_blocks,
                mask_value=DEFAULT_MASK_VALUE,
                inner=inner,
                fused_subs=(
                    min(diag_fused_subs, inner)
                    if diag_fused_subs > 0
                    else max(1, inner // 2)  # hybrid2: best on v5e
                ),
                score_dtype=jnp.int8 if score_dtype == "int8" else None,
            )
            diag_scratch = [
                pltpu.VMEM((NUM_SUBLANES, group * block), jnp.float32),
                pltpu.VMEM((NUM_SUBLANES, group * block), jnp.float32),
                pltpu.VMEM((d_pad, group * block), jnp.float32),
            ]
            if score_dtype == "int8":
                diag_scratch += [
                    pltpu.VMEM((group * block, d_pad), jnp.int8),
                    pltpu.SMEM((1, 1), jnp.float32),
                ]
            out = pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(b, hkv, nsteps),
                    in_specs=[
                        pl.BlockSpec(
                            (1, 1, group, block, d_pad),
                            lambda b_, h, t, qm, km: (b_, h, 0, qm[t], 0),
                        ),
                        pl.BlockSpec(
                            (1, 1, block, d_pad),
                            lambda b_, h, t, qm, km: (b_, h, km[t], 0),
                        ),
                        pl.BlockSpec(
                            (1, 1, block, d_pad),
                            lambda b_, h, t, qm, km: (b_, h, km[t], 0),
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (1, 1, group, block, d_pad),
                        lambda b_, h, t, qm, km: (b_, h, 0, qm[t], 0),
                    ),
                    scratch_shapes=diag_scratch,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (b, hkv, group, sq_pad, d_pad), q.dtype
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(
                        "parallel", "parallel", "arbitrary",
                    ),
                ),
                cost_estimate=pl.CostEstimate(
                    flops=int(4 * b * hq * sq * skv * d_pad * 0.5),
                    bytes_accessed=int(
                        2 * q.size * q.dtype.itemsize
                        + (k.size + v.size) * k.dtype.itemsize
                    ),
                    transcendentals=int(b * hq * sq * skv * 0.5),
                ),
                interpret=interpret,
                name="flash_attention_fwd_diag",
            )(qmap, kvmap, qg, k, v)
            out = out.reshape(b, hq, sq_pad, d_pad)
            if sq_pad != sq or d_pad != d:
                out = out[:, :, :sq, :d]
            return out

    grid = (b, hkv, sq_pad // block_q, skv_pad // block_kv)

    if fuse_group is None:
        # Fused tile: p_t f32 [sub_kv, G*block_q] + acc f32 [d, G*block_q]
        # plus the q tile must fit ~16 MB VMEM alongside the double-buffered
        # K/V blocks; the unfused per-head loop is the fallback beyond that.
        fused_bytes = (
            (block_kv // max(inner_splits, 1) + d_pad + NUM_SUBLANES * 2)
            * (group * block_q) * 4
            + group * block_q * d_pad * q.dtype.itemsize
        )
        fuse_group = group > 1 and fused_bytes <= 12 * 1024 * 1024
    if logit_softcap is not None:
        fuse_group = True  # soft-capping lives in the fused kernel only
    if return_clamps:
        fuse_group = True  # the counter lives in the fused lazy branch
    if score_dtype is not None:
        if score_dtype != "int8":
            raise ValueError(f"score_dtype must be 'int8' or None, got "
                             f"{score_dtype!r}")
        fuse_group = True  # int8 QK^T lives in the fused kernel only
    if not fuse_group and (
        stable is not True or inner_splits_requested > 1
    ):
        # The non-fused per-head kernel always runs the classic strict
        # softmax and has no inner sub-blocks: honoring correctness but
        # not the requested speed knobs would be silent (round-2 advisor
        # finding) — say so.
        import warnings

        warnings.warn(
            "flash_attention_fwd: fuse_group=False uses the per-head "
            f"kernel, which ignores stable={stable!r} and inner_splits "
            "(it always runs the exact strict softmax); pass "
            "fuse_group=True (or leave it auto) for the lazy-max/"
            "inner-split fast path",
            stacklevel=2,
        )

    # Static mask policy: count straddling vs computed grid cells for this
    # exact geometry. When a large fraction of the causal/window work sits
    # on diagonal tiles (short S relative to the block sizes — e.g. the
    # S=1024 headline), building the bias straight-line beats lax.cond by
    # ~8% on v5e (the cond serializes Mosaic's cross-sub-block pipeline);
    # with interiors dominating (long S), the cond skips the build cost.
    mask_inline = False
    if causal or window is not None or skv_pad != skv:
        offset0 = skv - sq
        num_q_b = sq_pad // block_q
        num_kv_b = skv_pad // block_kv
        computed = straddle = 0
        for i in range(num_q_b):
            for j in range(num_kv_b):
                run = True
                if causal:
                    run = j * block_kv <= (i + 1) * block_q - 1 + offset0
                if window is not None:
                    below = (
                        (j + 1) * block_kv - 1
                        <= i * block_q + offset0 - window
                    )
                    run = run and not below
                if not run:
                    continue
                computed += 1
                s = False
                if causal:
                    s = s or ((j + 1) * block_kv - 1 > i * block_q + offset0)
                if window is not None:
                    s = s or (
                        j * block_kv
                        <= i * block_q + block_q - 1 + offset0 - window
                    )
                if skv_pad != skv and j == num_kv_b - 1:
                    s = True
                straddle += bool(s)
        mask_inline = computed > 0 and straddle / computed >= 0.3

    kernel = functools.partial(
        _flash_fwd_kernel_fused if fuse_group else _flash_fwd_kernel,
        causal=causal,
        window=window,
        group=group,
        block_q=block_q,
        block_kv=block_kv,
        q_len=sq,
        kv_len=skv,
        kv_len_padded=skv_pad,
        mask_value=DEFAULT_MASK_VALUE,
        **(
            {
                "inner": inner_splits,
                "stable": stable,
                "logit_softcap": logit_softcap,
                "mask_inline": mask_inline,
                "score_dtype": jnp.int8 if score_dtype == "int8" else None,
            }
            if fuse_group
            else {}
        ),
    )
    extra_outs = []
    if return_lse:
        extra_outs.append("lse_ref")
    if return_clamps:
        extra_outs.append("clamp_ref")
    if extra_outs:
        base_kernel = kernel
        n_extra = len(extra_outs)

        def kernel(q_r, k_r, v_r, o_r, *rest):
            extras = dict(zip(extra_outs, rest[:n_extra]))
            base_kernel(q_r, k_r, v_r, o_r, *rest[n_extra:], **extras)

    flops_factor = 0.5 if causal else 1.0
    cost = pl.CostEstimate(
        flops=int(4 * b * hq * sq * skv * d_pad * flops_factor),
        bytes_accessed=int(
            2 * q.size * q.dtype.itemsize
            + (k.size + v.size) * k.dtype.itemsize
        ),
        transcendentals=int(b * hq * sq * skv * flops_factor),
    )

    # Clamp the KV block index to the causal/window-live range for each
    # q tile: steps the kernel will skip re-address the previous block, so
    # Pallas elides their HBM->VMEM copies (the DMA half of the block-level
    # skip; the compute half is the pl.when in the kernel). The clamp uses
    # only static offsets, so index maps stay scalar arithmetic.
    num_kv_blk = skv_pad // block_kv
    offset = skv - sq

    def kv_index(b_, h, i, j):
        jj = j
        if causal:
            last = (offset + (i + 1) * block_q - 1) // block_kv
            jj = jnp.minimum(jj, jnp.clip(last, 0, num_kv_blk - 1))
        if window is not None:
            first = (i * block_q + offset - window + 1) // block_kv
            jj = jnp.maximum(jj, jnp.clip(first, 0, num_kv_blk - 1))
        return (b_, h, jj, 0)

    out_specs = pl.BlockSpec(
        (1, 1, group, block_q, d_pad),
        lambda b_, h, i, j: (b_, h, 0, i, 0),
    )
    out_shape = jax.ShapeDtypeStruct((b, hkv, group, sq_pad, d_pad), q.dtype)
    if extra_outs:
        out_specs = [out_specs]
        out_shape = [out_shape]
        if return_lse:
            out_specs.append(
                pl.BlockSpec(
                    (1, 1, group, block_q), lambda b_, h, i, j: (b_, h, 0, i)
                )
            )
            out_shape.append(
                jax.ShapeDtypeStruct((b, hkv, group, sq_pad), jnp.float32)
            )
        if return_clamps:
            # Trailing (1, 1) dims so the block's last two dims equal the
            # array's (the Mosaic block-shape rule rejects a (1, 1) block
            # over a (b, hkv) array on hardware).
            out_specs.append(
                pl.BlockSpec(
                    (1, 1, 1, 1), lambda b_, h, i, j: (b_, h, 0, 0)
                )
            )
            out_shape.append(
                jax.ShapeDtypeStruct((b, hkv, 1, 1), jnp.float32)
            )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, group, block_q, d_pad),
                lambda b_, h, i, j: (b_, h, 0, i, 0),
            ),
            pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
            pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [
                pltpu.VMEM((NUM_SUBLANES, group * block_q), jnp.float32),
                pltpu.VMEM((NUM_SUBLANES, group * block_q), jnp.float32),
                pltpu.VMEM((d_pad, group * block_q), jnp.float32),
            ]
            + (
                [
                    pltpu.VMEM((group * block_q, d_pad), jnp.int8),
                    pltpu.SMEM((1, 1), jnp.float32),
                ]
                if score_dtype is not None
                else []
            )
            if fuse_group
            else [
                pltpu.VMEM((group, NUM_SUBLANES, block_q), jnp.float32),
                pltpu.VMEM((group, NUM_SUBLANES, block_q), jnp.float32),
                pltpu.VMEM((group, d_pad, block_q), jnp.float32),
            ]
        ),
        compiler_params=pltpu.CompilerParams(
            # The clamp counter accumulates one scalar across the q-block
            # dim, so that dim must stay sequential when return_clamps is
            # set (a megacore-partitioned "parallel" dim would race the
            # read-modify-write at flash_fwd.py:_init_clamp).
            dimension_semantics=(
                "parallel",
                "parallel",
                "arbitrary" if return_clamps else "parallel",
                "arbitrary",
            ),
        ),
        cost_estimate=cost,
        interpret=interpret,
        debug=debug,
        name="flash_attention_fwd",
    )(qg, k, v)

    clamps = None
    if extra_outs:
        out, *extras = out
        if return_lse:
            lse = extras.pop(0)
            lse = lse.reshape(b, hq, sq_pad)[:, :, :sq]
        if return_clamps:
            clamps = extras.pop(0)[:, :, 0, 0]
    out = out.reshape(b, hq, sq_pad, d_pad)
    if sq_pad != sq or d_pad != d:
        out = out[:, :, :sq, :d]
    if not extra_outs:
        return out
    result = (out,)
    if return_lse:
        result += (lse,)
    if return_clamps:
        result += (clamps,)
    return result
