"""Flash-attention BACKWARD Pallas kernels (recompute, O(S) memory).

The reference is strictly forward-only (reference: SURVEY.md §2.2
"forward only"); round 1 backed `jax.grad` with an XLA stand-in that
materialized the full S_q x S_kv score matrix. These kernels replace it:
FlashAttention-2-style backward with score recomputation from the saved
log-sum-exp — nothing quadratic ever touches HBM.

Math (natural units; s = scale * q.k, p = exp(s - lse)):

    delta_i = sum_d dO_id O_id                      (XLA, elementwise)
    dV_j    = sum_i p_ij dO_i
    dP_ij   = dO_i . V_j
    dS_ij   = p_ij (dP_ij - delta_i)                (softmax Jacobian)
    dQ_i    = scale * sum_j dS_ij K_j
    dK_j    = scale * sum_i dS_ij Q_i

Two kernels, split by accumulation direction (the standard TPU shape —
output blocks may not be revisited non-contiguously):

  * dKdV: grid (B, Hkv, kv_block, q_block) — q innermost ("arbitrary"),
    dK/dV accumulate in VMEM scratch across q blocks; the GQA group
    folds in via the in-kernel head loop (grads sum over the group).
  * dQ:   grid (B, Hkv, q_block, kv_block) — kv innermost, dQ^T
    accumulates in scratch exactly like the forward's O^T.

Both kernels use the forward's TRANSPOSED orientation (S^T tiles
[block_kv, block_q]) so lse and delta stay (1, block_q) LANE vectors
(see ops/flash_fwd.py design notes), and both reuse the forward's
log2-domain trick: q arrives pre-scaled by softmax_scale*log2e and
p = exp2(s2 - lse2) with the lse saved by `flash_attention_fwd(...,
return_lse=True)`. Causal/window block skipping mirrors the forward:
`pl.when` for compute, index-map clamping to elide the DMAs of skipped
blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_cute_tpu.ops.flash_fwd import (
    LOG2E,
    NUM_LANES,
    _round_up,
)

INV_LOG2E = 1.0 / LOG2E


def _allowed_mask(
    kv_start, q_start, block_kv, block_q, causal, window, offset, kv_len,
    kv_padded,
):
    """[block_kv, block_q] bool of positions that participate, or None if
    every position in the tile does."""
    need = causal or window is not None or kv_padded
    if not need:
        return None
    kv_pos = (
        jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 0) + kv_start
    )
    q_pos = (
        jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 1) + q_start
    )
    allowed = None

    def _and(a, b):
        return b if a is None else jnp.logical_and(a, b)

    if causal:
        allowed = _and(allowed, kv_pos <= q_pos + offset)
    if window is not None:
        allowed = _and(allowed, kv_pos > q_pos + offset - window)
    if kv_padded:
        allowed = _and(allowed, kv_pos < kv_len)
    return allowed


def _flash_bwd_dkv_kernel(
    q_ref,  # [1, 1, g, block_q, d] (pre-scaled by scale*log2e)
    do_ref,  # [1, 1, g, block_q, d]
    lse_ref,  # [1, 1, g, block_q] f32 (log2 units; +inf on dead rows)
    delta_ref,  # [1, 1, g, block_q] f32
    k_ref,  # [1, 1, block_kv, d]
    v_ref,  # [1, 1, block_kv, d]
    dk_ref,  # [1, 1, block_kv, d]
    dv_ref,  # [1, 1, block_kv, d]
    dk_scr,  # [block_kv, d] f32
    dv_scr,  # [block_kv, d] f32
    *,
    causal: bool,
    window: int | None,
    group: int,
    block_q: int,
    block_kv: int,
    q_len: int,
    kv_len: int,
    kv_len_padded: int,
):
    j = pl.program_id(2)  # kv block
    i = pl.program_id(3)  # q block (inner, sequential)
    num_i = pl.num_programs(3)
    offset = kv_len - q_len
    kv_padded = kv_len_padded != kv_len

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    if causal:
        should_run = j * block_kv <= (i + 1) * block_q - 1 + offset
    else:
        should_run = True
    if window is not None:
        below = (j + 1) * block_kv - 1 <= i * block_q + offset - window
        should_run = jnp.logical_and(should_run, jnp.logical_not(below))

    @pl.when(should_run)
    def _run():
        k = k_ref[0, 0]  # [block_kv, d]
        v = v_ref[0, 0]
        allowed = _allowed_mask(
            j * block_kv, i * block_q, block_kv, block_q, causal, window,
            offset, kv_len, kv_padded,
        )
        for g in range(group):
            q = q_ref[0, 0, g]  # [block_q, d]
            do = do_ref[0, 0, g]
            lse = lse_ref[0, 0, g : g + 1]  # [1, block_q] lane vector
            delta = delta_ref[0, 0, g : g + 1]

            s_t = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [block_kv, block_q], log2-scaled units
            p_t = jnp.exp2(s_t - lse)  # lse=+inf on dead/padded rows -> 0
            if allowed is not None:
                p_t = jnp.where(allowed, p_t, 0.0)

            # dV += P dO  (cast P to the operand dtype, like the forward's
            # PV matmul).
            dv_scr[...] += jax.lax.dot_general(
                p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            # dP^T = V dO^T; dS = P * (dP - delta)  (natural units).
            dp_t = jax.lax.dot_general(
                v, do, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [block_kv, block_q]
            ds_t = p_t * (dp_t - delta)

            # dK += dS^T Q_scaled; the fold of scale*log2e in Q leaves an
            # extra log2e, divided out at store time.
            dk_scr[...] += jax.lax.dot_general(
                ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(i == num_i - 1)
    def _store():
        dk_ref[0, 0] = (dk_scr[...] * INV_LOG2E).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref,  # [1, 1, g, block_q, d] (pre-scaled)
    do_ref,  # [1, 1, g, block_q, d]
    lse_ref,  # [1, 1, g, block_q]
    delta_ref,  # [1, 1, g, block_q]
    k_ref,  # [1, 1, block_kv, d]
    v_ref,  # [1, 1, block_kv, d]
    dq_ref,  # [1, 1, g, block_q, d]
    acc_scr,  # [g, d, block_q] f32 — dQ^T accumulator
    *,
    causal: bool,
    window: int | None,
    sm_scale: float,
    group: int,
    block_q: int,
    block_kv: int,
    q_len: int,
    kv_len: int,
    kv_len_padded: int,
):
    i = pl.program_id(2)  # q block
    j = pl.program_id(3)  # kv block (inner, sequential)
    num_j = pl.num_programs(3)
    offset = kv_len - q_len
    kv_padded = kv_len_padded != kv_len

    @pl.when(j == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal:
        should_run = j * block_kv <= (i + 1) * block_q - 1 + offset
    else:
        should_run = True
    if window is not None:
        below = (j + 1) * block_kv - 1 <= i * block_q + offset - window
        should_run = jnp.logical_and(should_run, jnp.logical_not(below))

    @pl.when(should_run)
    def _run():
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        allowed = _allowed_mask(
            j * block_kv, i * block_q, block_kv, block_q, causal, window,
            offset, kv_len, kv_padded,
        )
        for g in range(group):
            q = q_ref[0, 0, g]
            do = do_ref[0, 0, g]
            lse = lse_ref[0, 0, g : g + 1]
            delta = delta_ref[0, 0, g : g + 1]

            s_t = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p_t = jnp.exp2(s_t - lse)
            if allowed is not None:
                p_t = jnp.where(allowed, p_t, 0.0)

            dp_t = jax.lax.dot_general(
                v, do, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds_t = p_t * (dp_t - delta)

            # dQ^T += K^T dS^T: contract the block_kv axes -> [d, block_q].
            acc_scr[g] += jax.lax.dot_general(
                k, ds_t.astype(k.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(j == num_j - 1)
    def _store():
        for g in range(group):
            dq_t = acc_scr[g] * sm_scale  # k was unscaled: plain scale
            dq_ref[0, 0, g] = dq_t.T.astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "window", "block_q", "block_kv",
        "interpret", "debug",
    ),
)
def flash_attention_bwd(
    q: jax.Array,  # [B, Hq, Sq, D] (UNSCALED — the fold happens here)
    k: jax.Array,  # [B, Hkv, Skv, D]
    v: jax.Array,
    o: jax.Array,  # [B, Hq, Sq, D] forward output
    do: jax.Array,  # [B, Hq, Sq, D] output cotangent
    lse: jax.Array,  # [B, Hq, Sq] f32 from flash_attention_fwd(return_lse=True)
    sm_scale: float | None = None,
    causal: bool = False,
    window: int | None = None,
    block_q: int = 0,
    block_kv: int = 0,
    interpret: bool = False,
    debug: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """dQ/dK/dV via the recompute backward kernels. Memory is O(S)."""
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    assert k.shape == v.shape and hq % hkv == 0
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
    skv_pad = _round_up(skv, block_kv)

    # delta = rowsum(dO * O): cheap elementwise XLA, O(S*D) traffic.
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # [B, Hq, Sq]

    qs = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)

    if d_pad != d:
        pad = [(0, 0)] * 3 + [(0, d_pad - d)]
        qs, k, v, do = (jnp.pad(x, pad) for x in (qs, k, v, do))
    if sq_pad != sq:
        pad = [(0, 0), (0, 0), (0, sq_pad - sq), (0, 0)]
        qs, do = (jnp.pad(x, pad) for x in (qs, do))
        # Padded q rows must contribute nothing: lse=+inf -> p = 0.
        lse = jnp.pad(
            lse, [(0, 0), (0, 0), (0, sq_pad - sq)],
            constant_values=jnp.inf,
        )
        delta = jnp.pad(delta, [(0, 0), (0, 0), (0, sq_pad - sq)])
    if skv_pad != skv:
        pad = [(0, 0), (0, 0), (0, skv_pad - skv), (0, 0)]
        k, v = (jnp.pad(x, pad) for x in (k, v))

    qg = qs.reshape(b, hkv, group, sq_pad, d_pad)
    dog = do.reshape(b, hkv, group, sq_pad, d_pad)
    lseg = lse.astype(jnp.float32).reshape(b, hkv, group, sq_pad)
    deltag = delta.reshape(b, hkv, group, sq_pad)

    num_q_blk = sq_pad // block_q
    num_kv_blk = skv_pad // block_kv
    offset = skv - sq

    # ---- dK/dV: grid (b, hkv, kv_blk, q_blk), q innermost ----
    # Clamp the q-block index to this kv block's live range so skipped
    # steps re-address the previous block and their DMAs are elided
    # (mirror of the forward's kv_index clamp).
    def q_idx(j, i):
        ii = i
        if causal:
            first = (j * block_kv - offset) // block_q
            ii = jnp.maximum(ii, jnp.clip(first, 0, num_q_blk - 1))
        if window is not None:
            x = (j + 1) * block_kv - 1 + window - offset
            last = (x - 1) // block_q
            ii = jnp.minimum(ii, jnp.clip(last, 0, num_q_blk - 1))
        return ii

    def qmeta5(b_, h, j, i):
        return (b_, h, 0, q_idx(j, i), 0)

    def qmeta4(b_, h, j, i):
        return (b_, h, 0, q_idx(j, i))

    dkv_kernel = functools.partial(
        _flash_bwd_dkv_kernel,
        causal=causal,
        window=window,
        group=group,
        block_q=block_q,
        block_kv=block_kv,
        q_len=sq,
        kv_len=skv,
        kv_len_padded=skv_pad,
    )

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, hkv, num_kv_blk, num_q_blk),
        in_specs=[
            pl.BlockSpec((1, 1, group, block_q, d_pad), qmeta5),
            pl.BlockSpec((1, 1, group, block_q, d_pad), qmeta5),
            pl.BlockSpec((1, 1, group, block_q), qmeta4),
            pl.BlockSpec((1, 1, group, block_q), qmeta4),
            pl.BlockSpec(
                (1, 1, block_kv, d_pad), lambda b_, h, j, i: (b_, h, j, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d_pad), lambda b_, h, j, i: (b_, h, j, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_kv, d_pad), lambda b_, h, j, i: (b_, h, j, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d_pad), lambda b_, h, j, i: (b_, h, j, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, skv_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b, hkv, skv_pad, d_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d_pad), jnp.float32),
            pltpu.VMEM((block_kv, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary",
            ),
        ),
        interpret=interpret,
        debug=debug,
        name="flash_attention_bwd_dkv",
    )(qg, dog, lseg, deltag, k, v)

    # ---- dQ: grid (b, hkv, q_blk, kv_blk), kv innermost ----
    def kv_idx(i, j):
        jj = j
        if causal:
            last = (offset + (i + 1) * block_q - 1) // block_kv
            jj = jnp.minimum(jj, jnp.clip(last, 0, num_kv_blk - 1))
        if window is not None:
            first = (i * block_q + offset - window + 1) // block_kv
            jj = jnp.maximum(jj, jnp.clip(first, 0, num_kv_blk - 1))
        return jj

    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel,
        causal=causal,
        window=window,
        sm_scale=sm_scale,
        group=group,
        block_q=block_q,
        block_kv=block_kv,
        q_len=sq,
        kv_len=skv,
        kv_len_padded=skv_pad,
    )

    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, hkv, num_q_blk, num_kv_blk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, group, block_q, d_pad),
                lambda b_, h, i, j: (b_, h, 0, i, 0),
            ),
            pl.BlockSpec(
                (1, 1, group, block_q, d_pad),
                lambda b_, h, i, j: (b_, h, 0, i, 0),
            ),
            pl.BlockSpec(
                (1, 1, group, block_q), lambda b_, h, i, j: (b_, h, 0, i)
            ),
            pl.BlockSpec(
                (1, 1, group, block_q), lambda b_, h, i, j: (b_, h, 0, i)
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d_pad),
                lambda b_, h, i, j: (b_, h, kv_idx(i, j), 0),
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d_pad),
                lambda b_, h, i, j: (b_, h, kv_idx(i, j), 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group, block_q, d_pad),
            lambda b_, h, i, j: (b_, h, 0, i, 0),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, hkv, group, sq_pad, d_pad), q.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((group, d_pad, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary",
            ),
        ),
        interpret=interpret,
        debug=debug,
        name="flash_attention_bwd_dq",
    )(qg, dog, lseg, deltag, k, v)

    dq = dq.reshape(b, hq, sq_pad, d_pad)[:, :, :sq, :d]
    dk = dk[:, :, :skv, :d]
    dv = dv[:, :, :skv, :d]
    return dq, dk, dv
