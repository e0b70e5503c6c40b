"""Experimental prefill-kernel variants attacking the MXU/VPU overlap gap.

Round-1 finding (ROADMAP.md): the fused kernel plateaus at ~57% MXU raw
while the plain matmul ladder reaches 85% — and the dependency analysis
says why: the accumulator chain `acc *= alpha (VPU); acc += PV (MXU)`
alternates units on the SAME buffer every inner sub-block, so the Mosaic
scheduler cannot overlap the exp2/reduction chain of sub-block i with the
matmuls of sub-block i+1.

Variants measured by benchmarks/experiment_overlap.py on the real chip:

  multiacc — per-sub-block PRIVATE accumulators acc_i = V_i^T P_i with
    LOCAL maxima m_i; the running-max rescale happens once per KV block in
    a combine step (acc = acc*alpha + sum_i acc_i * exp2(m_i - m_next)).
    All 2*inner matmuls in a block are then dependency-free of each other
    and of the running stats; the only VPU->MXU edge left is s_i -> p_i ->
    PV_i within a sub-block, which pipelines across sub-blocks.

  twophase — all inner QK^T matmuls first, scores parked in a VMEM
    scratch; one block-wide max; then exp2_i -> PV_i stream. Exposes the
    same parallelism with one scratch instead of `inner` accumulators, at
    the cost of a full extra VMEM round trip of the score tile.

The winning structure graduates into ops/flash_fwd.py.
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


def _mk_bias(sub_start, q_blk, sub_kv, block_q, group, causal, offset,
             kv_len, kv_padded, mask_value):
    def build_bias():
        kv_pos = jax.lax.broadcasted_iota(
            jnp.int32, (sub_kv, block_q), 0
        ) + sub_start
        q_pos = jax.lax.broadcasted_iota(
            jnp.int32, (sub_kv, block_q), 1
        ) + q_blk * block_q
        allowed = kv_pos <= q_pos + offset
        if kv_padded:
            allowed &= kv_pos < kv_len
        bias = jnp.where(allowed, 0.0, mask_value).astype(jnp.float32)
        return jnp.tile(bias, (1, group))

    needs = False
    if causal:
        needs = sub_start + sub_kv - 1 > q_blk * block_q + offset
    if kv_padded:
        needs = (sub_start + sub_kv > kv_len) if needs is False else True
    if needs is False:
        return None
    return jax.lax.cond(
        needs, build_bias,
        lambda: jnp.zeros((sub_kv, group * block_q), jnp.float32),
    )


def _kernel_multiacc(
    q_ref, k_ref, v_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *,
    causal, group, block_q, block_kv, q_len, kv_len, kv_len_padded,
    mask_value, inner,
):
    q_blk = pl.program_id(2)
    kv_blk = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)
    sub_kv = block_kv // inner
    offset = kv_len - q_len
    kv_padded = kv_len_padded != kv_len

    @pl.when(kv_blk == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    if causal:
        should_run = kv_blk * block_kv <= (q_blk + 1) * block_q - 1 + offset
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0].reshape(group * block_q, q_ref.shape[-1])

        m_loc, l_loc, accs = [], [], []
        for si in range(inner):
            sub_start = kv_blk * block_kv + si * sub_kv
            k = k_ref[0, 0, si * sub_kv : (si + 1) * sub_kv]
            v = v_ref[0, 0, si * sub_kv : (si + 1) * sub_kv]
            s_t = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            bias = _mk_bias(sub_start, q_blk, sub_kv, block_q, group,
                            causal, offset, kv_len, kv_padded, mask_value)
            if bias is not None:
                s_t += bias
            m_i = jnp.max(s_t, axis=0, keepdims=True)  # [1, G*bq] local
            p_i = jnp.exp2(s_t - m_i)
            l_i = jnp.sum(p_i, axis=0, keepdims=True)
            acc_i = jax.lax.dot_general(
                v, p_i.astype(v.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_loc.append(m_i)
            l_loc.append(l_i)
            accs.append(acc_i)

        # One running-max combine per KV block.
        m_blk = m_loc[0]
        for m_i in m_loc[1:]:
            m_blk = jnp.maximum(m_blk, m_i)
        m_prev = m_scratch[:1]
        m_next = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp2(m_prev - m_next)

        l_new = l_scratch[:1] * alpha
        acc = acc_scratch[...] * alpha
        for m_i, l_i, acc_i in zip(m_loc, l_loc, accs):
            w_i = jnp.exp2(m_i - m_next)
            l_new = l_new + l_i * w_i
            acc = acc + acc_i * w_i
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)
        acc_scratch[...] = acc

    @pl.when(kv_blk == num_kv_blocks - 1)
    def _store():
        l = l_scratch[:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_t = acc_scratch[...] * l_inv
        d_pad = acc_scratch.shape[0]
        o_ref[0, 0] = o_t.T.reshape(group, block_q, d_pad).astype(o_ref.dtype)


def _kernel_twophase(
    q_ref, k_ref, v_ref, o_ref,
    m_scratch, l_scratch, acc_scratch, s_scratch,
    *,
    causal, group, block_q, block_kv, q_len, kv_len, kv_len_padded,
    mask_value, inner,
):
    q_blk = pl.program_id(2)
    kv_blk = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)
    sub_kv = block_kv // inner
    offset = kv_len - q_len
    kv_padded = kv_len_padded != kv_len

    @pl.when(kv_blk == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    if causal:
        should_run = kv_blk * block_kv <= (q_blk + 1) * block_q - 1 + offset
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0].reshape(group * block_q, q_ref.shape[-1])

        # Phase A: all QK^T matmuls back to back, scores to VMEM scratch.
        for si in range(inner):
            sub_start = kv_blk * block_kv + si * sub_kv
            k = k_ref[0, 0, si * sub_kv : (si + 1) * sub_kv]
            s_t = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            bias = _mk_bias(sub_start, q_blk, sub_kv, block_q, group,
                            causal, offset, kv_len, kv_padded, mask_value)
            if bias is not None:
                s_t += bias
            s_scratch[si * sub_kv : (si + 1) * sub_kv] = s_t

        # One block-wide max + one rescale.
        m_blk = jnp.max(s_scratch[...], axis=0, keepdims=True)
        m_prev = m_scratch[:1]
        m_next = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp2(m_prev - m_next)
        acc_scratch[...] *= alpha
        l_new = l_scratch[:1] * alpha

        # Phase B: exp2_i -> PV_i stream.
        for si in range(inner):
            v = v_ref[0, 0, si * sub_kv : (si + 1) * sub_kv]
            p_i = jnp.exp2(s_scratch[si * sub_kv : (si + 1) * sub_kv] - m_next)
            l_new = l_new + jnp.sum(p_i, axis=0, keepdims=True)
            acc_scratch[...] += jax.lax.dot_general(
                v, p_i.astype(v.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(kv_blk == num_kv_blocks - 1)
    def _store():
        l = l_scratch[:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_t = acc_scratch[...] * l_inv
        d_pad = acc_scratch.shape[0]
        o_ref[0, 0] = o_t.T.reshape(group, block_q, d_pad).astype(o_ref.dtype)


def _kernel_probe(
    q_ref, k_ref, v_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *,
    causal, group, block_q, block_kv, q_len, kv_len, kv_len_padded,
    mask_value, inner, mode, subskip=False,
):
    """Cost-decomposition probe: the production fused kernel with softmax
    stages selectively removed (WRONG numerics except mode='full') to
    attribute the MXU-efficiency gap:
      noexp   — matmuls + cast only (p = s)
      exponly — + exp2
      expsum  — + row sum (l), no max (== stable=False)
      bf16exp — exp2 evaluated in bf16 (half-width VPU transcendental)
      full    — the real thing (stable=True)
    """
    q_blk = pl.program_id(2)
    kv_blk = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)
    sub_kv = block_kv // inner
    offset = kv_len - q_len
    kv_padded = kv_len_padded != kv_len

    @pl.when(kv_blk == 0)
    def _init():
        # lazymax references the running max BEFORE seeing any scores: 0
        # (not -inf) keeps the first block's exp2 finite; the reference
        # point cancels in o = acc/l so any finite init is exact.
        m_scratch[...] = jnp.full_like(
            m_scratch,
            0.0
            if mode in ("lazymax", "lazy_nocond", "lazy_where")
            else -jnp.inf,
        )
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    if causal:
        should_run = kv_blk * block_kv <= (q_blk + 1) * block_q - 1 + offset
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0].reshape(group * block_q, q_ref.shape[-1])
        for si in range(inner):
          sub_start = kv_blk * block_kv + si * sub_kv

          def _sub(si=si, sub_start=sub_start):
            k = k_ref[0, 0, si * sub_kv : (si + 1) * sub_kv]
            v = v_ref[0, 0, si * sub_kv : (si + 1) * sub_kv]
            s_t = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mode not in ("lazy_nocond", "lazy_where"):
                bias = _mk_bias(sub_start, q_blk, sub_kv, block_q, group,
                                causal, offset, kv_len, kv_padded,
                                mask_value)
                if bias is not None:
                    s_t += bias

            if mode in ("lazy_nocond", "lazy_where") and causal:
                # Mask-application variants on top of the lazy max:
                #   lazy_nocond — additive bias built UNCONDITIONALLY for
                #     every sub-block (is lax.cond the serializer?)
                #   lazy_where  — boolean mask folded in via select on p
                kv_pos = jax.lax.broadcasted_iota(
                    jnp.int32, (sub_kv, block_q), 0
                ) + sub_start
                q_pos = jax.lax.broadcasted_iota(
                    jnp.int32, (sub_kv, block_q), 1
                ) + q_blk * block_q
                allowed = jnp.tile(kv_pos <= q_pos + offset, (1, group))
                if mode == "lazy_nocond":
                    s_t = s_t + jnp.where(allowed, 0.0, mask_value).astype(
                        jnp.float32
                    )
                    allowed = None
            else:
                allowed = None
            if mode in ("lazymax", "lazy_nocond", "lazy_where"):
                # Lagging running max: p uses the PREVIOUS block's max, so
                # the max tree and the acc rescale drop off the
                # QK->exp2->PV critical path (they overlap the matmuls).
                # Exact: the reference point cancels in o = acc/l; the
                # clamp only guards f32 exp2 overflow (score jumping
                # >110 log2-units above the running max — ~76 nats).
                m_prev = m_scratch[:1]
                p_t = jnp.exp2(jnp.minimum(s_t - m_prev, 110.0))
                if allowed is not None:  # lazy_where: select after exp2
                    p_t = jnp.where(allowed, p_t, 0.0)
                    s_t = jnp.where(allowed, s_t, mask_value)
                p_op = p_t.astype(v.dtype)
                l_tmp = l_scratch[:1] + jnp.sum(p_t, axis=0, keepdims=True)
                m_next = jnp.maximum(
                    m_prev, jnp.max(s_t, axis=0, keepdims=True)
                )
                alpha = jnp.exp2(m_prev - m_next)
                l_scratch[...] = jnp.broadcast_to(
                    l_tmp * alpha, l_scratch.shape
                )
                m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
                acc_scratch[...] += jax.lax.dot_general(
                    v, p_op, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_scratch[...] *= alpha
                return
            if mode == "noexp":
                p_op = s_t.astype(v.dtype)
            elif mode == "exponly":
                p_op = jnp.exp2(s_t).astype(v.dtype)
            elif mode == "expsum":
                p_t = jnp.exp2(s_t)
                p_op = p_t.astype(v.dtype)
                l_scratch[...] = jnp.broadcast_to(
                    l_scratch[:1] + jnp.sum(p_t, axis=0, keepdims=True),
                    l_scratch.shape,
                )
            elif mode == "bf16exp":
                m_prev = m_scratch[:1]
                m_curr = jnp.max(s_t, axis=0, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp2(m_prev - m_next)
                p_op = jnp.exp2((s_t - m_next).astype(jnp.bfloat16))
                l_next = alpha * l_scratch[:1] + jnp.sum(
                    p_op.astype(jnp.float32), axis=0, keepdims=True
                )
                m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
                l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
                acc_scratch[...] *= alpha
            else:  # full
                m_prev = m_scratch[:1]
                m_curr = jnp.max(s_t, axis=0, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp2(m_prev - m_next)
                p_t = jnp.exp2(s_t - m_next)
                p_op = p_t.astype(v.dtype)
                l_next = alpha * l_scratch[:1] + jnp.sum(
                    p_t, axis=0, keepdims=True
                )
                m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
                l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
                acc_scratch[...] *= alpha

            acc_scratch[...] += jax.lax.dot_general(
                v, p_op, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

          if subskip and causal:
            # Sub-block-level diagonal skip: big DMA blocks, fine-grained
            # compute skipping — the sub-block is entirely above every
            # row's causal bound iff its first kv position exceeds the
            # q block's last bound.
            pl.when(sub_start <= q_blk * block_q + block_q - 1 + offset)(
                _sub
            )
          else:
            _sub()

    @pl.when(kv_blk == num_kv_blocks - 1)
    def _store():
        l = l_scratch[:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_t = acc_scratch[...] * l_inv
        d_pad = acc_scratch.shape[0]
        o_ref[0, 0] = o_t.T.reshape(group, block_q, d_pad).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "variant", "causal", "block_q", "block_kv", "inner", "mode",
        "pad_d", "subskip", "interpret",
    ),
)
def flash_fwd_variant(
    q, k, v,
    variant: str = "multiacc",
    causal: bool = False,
    block_q: int = 256,
    block_kv: int = 512,
    inner: int = 4,
    mode: str = "full",
    pad_d: bool = True,
    subskip: bool = False,
    interpret: bool = False,
):
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv
    sm_scale = d ** -0.5

    if pad_d:
        d_pad = _round_up(max(d, NUM_LANES), NUM_LANES)
    else:
        # 128 < d < 256 experiment: keep the NATIVE head dim as the lane
        # dimension (Mosaic pads the physical VMEM tile, but HBM blocks,
        # DMAs, and the jnp.pad materialization all stay at true d).
        d_pad = max(_round_up(d, NUM_SUBLANES), NUM_LANES)
    block_q = min(block_q, _round_up(sq, NUM_LANES))
    block_kv = min(block_kv, _round_up(skv, NUM_LANES))
    while inner > 1 and (block_kv % inner or block_kv // inner < 8):
        inner -= 1
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_kv)

    q = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)
    if d_pad != d:
        pad = [(0, 0)] * 3 + [(0, d_pad - d)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    if sq_pad != sq:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, sq_pad - sq), (0, 0)])
    if skv_pad != skv:
        pad = [(0, 0), (0, 0), (0, skv_pad - skv), (0, 0)]
        k, v = (jnp.pad(x, pad) for x in (k, v))

    qg = q.reshape(b, hkv, group, sq_pad, d_pad)
    grid = (b, hkv, sq_pad // block_q, skv_pad // block_kv)
    num_kv_blk = skv_pad // block_kv
    offset = skv - sq

    def kv_index(b_, h, i, j):
        jj = j
        if causal:
            last = (offset + (i + 1) * block_q - 1) // block_kv
            jj = jnp.minimum(jj, jnp.clip(last, 0, num_kv_blk - 1))
        return (b_, h, jj, 0)

    kern = {
        "multiacc": _kernel_multiacc,
        "twophase": _kernel_twophase,
        "probe": _kernel_probe,
    }[variant]
    scratch = [
        pltpu.VMEM((NUM_SUBLANES, group * block_q), jnp.float32),
        pltpu.VMEM((NUM_SUBLANES, group * block_q), jnp.float32),
        pltpu.VMEM((d_pad, group * block_q), jnp.float32),
    ]
    if variant == "twophase":
        scratch.append(
            pltpu.VMEM((block_kv, group * block_q), jnp.float32)
        )

    kernel = functools.partial(
        kern,
        causal=causal, group=group, block_q=block_q, block_kv=block_kv,
        q_len=sq, kv_len=skv, kv_len_padded=skv_pad,
        mask_value=DEFAULT_MASK_VALUE, inner=inner,
        **({"mode": mode, "subskip": subskip} if variant == "probe" else {}),
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
        out_specs=pl.BlockSpec(
            (1, 1, group, block_q, d_pad),
            lambda b_, h, i, j: (b_, h, 0, i, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, sq_pad, d_pad), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        name=f"flash_fwd_{variant}",
    )(qg, k, v)

    out = out.reshape(b, hq, sq_pad, d_pad)
    if sq_pad != sq or d_pad != d:
        out = out[:, :, :sq, :d]
    return out
