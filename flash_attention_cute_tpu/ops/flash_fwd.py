"""Fused flash-attention forward Pallas kernel (prefill path).

TPU-native re-design of the reference CUDA kernel
(reference: csrc/flash_attention_template.cuh:138-564 `flash_attention_v2`,
csrc/mask.cuh:30-88 `Mask`):

  * grid (batch, q_head, q_block, kv_block) replaces the CUDA grid
    (q_tiles, heads, batch) + in-kernel KV loop; the kv dimension is marked
    "arbitrary" so Mosaic keeps it sequential (it is the online-softmax
    reduction) while batch/head/q-tile dims run in parallel across megacores.
  * Pallas' automatic pipelining double-buffers the K/V HBM->VMEM block copies,
    replacing the hand-rolled cp.async two-stage pipeline
    (reference: flash_attention_template.cuh:323-385).
  * QK^T and PV run on the MXU via dot_general with fp32 accumulation,
    replacing ldmatrix + SM80 mma atoms (reference: template.cuh:253-274).
  * Online softmax runs on the VPU over fp32 tiles: per-row running max/sum
    are plain vector reductions — no warp shuffles
    (replaces template.cuh:445-487 + warp_reduce_max/sum:72-88).
  * Bottom-right-aligned causal masking via broadcasted_iota comparison
    (replaces the TV-layout inverse coordinate math of mask.cuh:7-27);
    whole KV blocks past the diagonal are skipped with pl.when
    (replaces mask.cuh:45-52 block skip).
  * 1/sum normalization deferred to the last KV block with the sum==0 -> 1.0
    guard for fully-masked rows (replaces template.cuh:516-528).

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

# Lane count: the minor dimension of every VPU/VMEM tile.
NUM_LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_fwd_kernel(
    q_ref,  # [1, 1, block_q, d]
    k_ref,  # [1, 1, block_kv, d]
    v_ref,  # [1, 1, block_kv, d]
    o_ref,  # [1, 1, block_q, d]
    m_scratch,  # [block_q, NUM_LANES] f32
    l_scratch,  # [block_q, NUM_LANES] f32
    acc_scratch,  # [block_q, d] f32
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_kv: int,
    q_len: int,  # real (unpadded) query length
    kv_len: int,  # real (unpadded) key/value length
    kv_len_padded: int,
    mask_value: float,
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

    if causal:
        # Skip KV blocks entirely above the diagonal: the block's first column
        # must not exceed the block's last row + offset
        # (reference: csrc/mask.cuh:45-52 block-level skip).
        should_run = kv_blk * block_kv <= (q_blk + 1) * block_q - 1 + offset
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # [block_q, d]
        k = k_ref[0, 0]  # [block_kv, d]
        v = v_ref[0, 0]  # [block_kv, d]

        # ---- QK^T on the MXU, fp32 accumulation ----
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_kv]
        s *= sm_scale

        # ---- masking (causal diagonal blocks + KV tail padding) ----
        kv_padded = kv_len_padded != kv_len
        mask = None
        if causal:
            # Only blocks straddling the diagonal need the elementwise mask;
            # blocks fully below it are all-allowed. This is a traced
            # condition, but the where() is cheap VPU work vs the matmuls.
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            rows = rows + q_blk * block_q
            cols = cols + kv_blk * block_kv
            mask = cols <= rows + offset
        if kv_padded:
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            cols = cols + kv_blk * block_kv
            oob = cols < kv_len
            mask = oob if mask is None else (mask & oob)
        if mask is not None:
            s = jnp.where(mask, s, mask_value)

        # ---- online softmax update (all fp32, VPU) ----
        m_prev = m_scratch[...]  # [block_q, NUM_LANES]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)  # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # broadcast -> [block_q, LANES]
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])  # [block_q, 1]
        p = jnp.exp(s - m_next[:, :1])  # [block_q, block_kv]
        l_curr = jnp.sum(p, axis=-1, keepdims=True)  # [block_q, 1]
        l_next = alpha * l_prev[:, :1] + l_curr

        m_scratch[...] = m_next
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        # ---- rescale previous accumulator, add P V ----
        acc_scratch[...] *= alpha  # broadcast [block_q,1] over [block_q,d]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[...] += pv

    @pl.when(kv_blk == num_kv_blocks - 1)
    def _store():
        # Deferred normalization; sum==0 -> scale 1.0 so fully-masked rows
        # (all KV blocks skipped) emit exactly 0
        # (reference: template.cuh:520-528 guard).
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        out = acc_scratch[...] * l_inv
        if causal and offset < 0:
            # q_len > kv_len: rows m < -offset are fully masked under
            # bottom-right alignment. When such a row shares a *visited*
            # block with valid rows, its l is polluted by
            # exp(mask_value - mask_value) == 1 terms — force exact zeros
            # (reference semantics: csrc/flash_attention_template.cuh:520-528).
            rows = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
            rows = rows + q_blk * block_q
            out = jnp.where(rows + offset < 0, 0.0, out)
        o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "block_q", "block_kv", "interpret", "debug",
    ),
)
def flash_attention_fwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: float | None = None,
    causal: bool = False,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,
    debug: bool = False,
) -> jax.Array:
    """Flash-attention forward for prefill.

    Args:
      q: [B, Hq, Sq, D] bf16/f16/f32
      k: [B, Hkv, Skv, D] with Hq % Hkv == 0 (GQA/MQA served in-kernel by
         index-mapping Hq -> Hq // group, replacing the CUDA base-pointer
         arithmetic at reference: template.cuh:158-159)
      v: [B, Hkv, Skv, D]
      sm_scale: defaults to D**-0.5
      causal: bottom-right-aligned causal masking
      block_q / block_kv: tile sizes (multiples of 128)

    Returns: [B, Hq, Sq, D] in q's dtype.
    """
    b, hq, sq, d = q.shape
    bk, hkv, skv, dk = k.shape
    assert k.shape == v.shape, (k.shape, v.shape)
    assert b == bk and d == dk, (q.shape, k.shape)
    assert hq % hkv == 0, f"Hq={hq} not a multiple of Hkv={hkv}"
    if sm_scale is None:
        sm_scale = d ** -0.5
    q_per_kv = hq // hkv

    # ---- padding to hardware-friendly shapes ----
    d_pad = _round_up(max(d, NUM_LANES), NUM_LANES)
    block_q = min(block_q, _round_up(sq, NUM_LANES))
    block_kv = min(block_kv, _round_up(skv, NUM_LANES))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_kv)

    if d_pad != d:
        pad = [(0, 0)] * 3 + [(0, d_pad - d)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    if sq_pad != sq:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, sq_pad - sq), (0, 0)])
    if skv_pad != skv:
        pad = [(0, 0), (0, 0), (0, skv_pad - skv), (0, 0)]
        k, v = (jnp.pad(x, pad) for x in (k, v))

    grid = (b, hq, sq_pad // block_q, skv_pad // block_kv)

    kernel = functools.partial(
        _flash_fwd_kernel,
        sm_scale=sm_scale,
        causal=causal,
        block_q=block_q,
        block_kv=block_kv,
        q_len=sq,
        kv_len=skv,
        kv_len_padded=skv_pad,
        mask_value=DEFAULT_MASK_VALUE,
    )

    flops_factor = 0.5 if causal else 1.0
    cost = pl.CostEstimate(
        flops=int(4 * b * hq * sq * skv * d_pad * flops_factor),
        bytes_accessed=int(
            q.size * q.dtype.itemsize
            + (k.size + v.size) * k.dtype.itemsize * q_per_kv
            + q.size * q.dtype.itemsize
        ),
        transcendentals=int(b * hq * sq * skv * flops_factor),
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d_pad),
                lambda b_, h, i, j: (b_, h, i, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d_pad),
                lambda b_, h, i, j, g=q_per_kv: (b_, h // g, j, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d_pad),
                lambda b_, h, i, j, g=q_per_kv: (b_, h // g, j, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_pad),
            lambda b_, h, i, j: (b_, h, i, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
        debug=debug,
        name="flash_attention_fwd",
    )(q, k, v)

    if sq_pad != sq or d_pad != d:
        out = out[:, :, :sq, :d]
    return out
