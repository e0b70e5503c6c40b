"""Split-KV flash-decoding Pallas kernel with GQA q-head-group packing.

Re-creates, TPU-natively, two things from the reference:

  1. The decode-time GQA q-head packing (reference:
     csrc/flash_attention_api.cpp:72-83,128-133): when seqlen_q == 1, queries
     [B, Hq, 1, D] are reshaped to [B, Hkv, G, D] (G = Hq/Hkv q heads per KV
     group) so the q-head group fills the MXU's M dimension instead of
     wasting a 128-row systolic pass on a single query row. Causality is
     dropped: a single new query attends to the whole (valid) cache under
     bottom-right alignment (reference: flash_attention_api.cpp:99).

  2. Split-KV flash decoding — an open roadmap item in the reference
     (reference: README.md:20 "splitkv (flash decoding)"). The KV sequence is
     partitioned into `num_splits` independent chunks processed in parallel
     grid cells; each emits an unnormalized partial accumulator plus its
     running (max, sum) statistics, and a cheap XLA combine merges them with
     the same online-softmax correction the in-kernel loop uses (the math
     already present at reference: template.cuh:516-528).

The kernel is KV-length aware: a `lengths [B]` scalar-prefetch operand masks
the cache tail and skips whole KV blocks past the valid length, so one
compiled kernel serves every cache fill level (no per-step recompiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_cute_tpu.ops.flash_fwd import (
    DEFAULT_MASK_VALUE,
    NUM_LANES,
    _round_up,
)


def _flash_decode_kernel(
    lengths_ref,  # [B] int32, scalar-prefetch (SMEM)
    q_ref,  # [1, 1, g_pad, d]
    k_ref,  # [1, 1, block_kv, d]
    v_ref,  # [1, 1, block_kv, d]
    o_ref,  # [1, 1, 1, g_pad, d]  unnormalized partial accumulator
    m_ref,  # [1, 1, 1, g_pad, NUM_LANES]
    l_ref,  # [1, 1, 1, g_pad, NUM_LANES]
    m_scratch,  # [g_pad, NUM_LANES] f32
    l_scratch,  # [g_pad, NUM_LANES] f32
    acc_scratch,  # [g_pad, d] f32
    *,
    sm_scale: float,
    window: int | None,
    logit_softcap: float | None,
    block_kv: int,
    blocks_per_split: int,
    mask_value: float,
):
    b = pl.program_id(0)
    split = pl.program_id(2)
    t = pl.program_id(3)

    @pl.when(t == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    length = lengths_ref[b]
    blk = split * blocks_per_split + t
    blk_start = blk * block_kv

    # Skip KV blocks entirely past the valid cache length (the decode analog
    # of the causal block skip, reference: csrc/mask.cuh:45-52). With a
    # sliding window, also skip blocks entirely below the window (the query
    # sits at position length-1, seeing keys n >= length - window).
    visible = blk_start < length
    if window is not None:
        visible = jnp.logical_and(visible, blk_start + block_kv > length - window)

    @pl.when(visible)
    def _run():
        q = q_ref[0, 0]  # [g_pad, d]
        k = k_ref[0, 0]  # [block_kv, d]
        v = v_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [g_pad, block_kv]
        s *= sm_scale
        if logit_softcap is not None:
            s = jnp.tanh(s * (1.0 / logit_softcap)) * logit_softcap

        # Mask the cache tail in the block straddling `length`.
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + blk_start
        ok = cols < length
        if window is not None:
            ok &= cols >= length - window
        s = jnp.where(ok, s, mask_value)

        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])
        p = jnp.exp(s - m_next[:, :1])
        l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

        m_scratch[...] = m_next
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
        acc_scratch[...] *= alpha
        acc_scratch[...] += jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == blocks_per_split - 1)
    def _store():
        o_ref[0, 0, 0] = acc_scratch[...]
        m_ref[0, 0, 0] = m_scratch[...]
        l_ref[0, 0, 0] = l_scratch[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "window", "logit_softcap", "num_splits", "block_kv",
        "interpret", "debug",
    ),
)
def flash_attention_decode(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_length: jax.Array | None = None,
    sm_scale: float | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
    num_splits: int = 0,
    block_kv: int = 2048,
    interpret: bool = False,
    debug: bool = False,
) -> jax.Array:
    """Single-token decode attention over a (possibly partially filled) cache.

    Args:
      q: [B, Hq, 1, D]
      k: [B, Hkv, Skv, D] KV cache (padded to capacity)
      v: [B, Hkv, Skv, D]
      kv_length: [B] int32 valid lengths; None means the cache is full.
      window: sliding-window size — only the last `window` cache positions
        are attended (reference raises on sliding windows,
        models/modeling_qwen2.py:261-269; here native).
      num_splits: KV-axis parallel splits; 0 picks a heuristic.

    Returns: [B, Hq, 1, D] in q's dtype.
    """
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    assert sq == 1, f"decode kernel requires seqlen_q == 1, got {sq}"
    assert hq % hkv == 0
    if sm_scale is None:
        sm_scale = d ** -0.5

    g = hq // hkv
    # Pack q-head groups into the M dimension; pad the group to the fp32
    # sublane minimum so the tile is well-formed.
    g_pad = max(8, _round_up(g, 8))

    d_pad = _round_up(max(d, NUM_LANES), NUM_LANES)
    block_kv = min(block_kv, _round_up(skv, NUM_LANES))
    skv_pad = _round_up(skv, block_kv)
    num_kv_blocks = skv_pad // block_kv

    if num_splits <= 0:
        # Heuristic: add splits until there is enough grid parallelism to
        # cover both megacores, without splitting below 2 blocks per split.
        num_splits = 1
        while (
            b * hkv * num_splits < 16
            and num_splits * 2 <= num_kv_blocks
        ):
            num_splits *= 2
    num_splits = min(num_splits, num_kv_blocks)
    blocks_per_split = pl.cdiv(num_kv_blocks, num_splits)
    # Re-pad so splits tile evenly.
    skv_pad = num_splits * blocks_per_split * block_kv

    qp = q.reshape(b, hkv, g, d)
    if g_pad != g:
        qp = jnp.pad(qp, [(0, 0), (0, 0), (0, g_pad - g), (0, 0)])
    if d_pad != d:
        pad = [(0, 0)] * 3 + [(0, d_pad - d)]
        qp = jnp.pad(qp, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    if skv_pad != skv:
        pad = [(0, 0), (0, 0), (0, skv_pad - skv), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    if kv_length is None:
        lengths = jnp.full((b,), skv, jnp.int32)
    else:
        lengths = jnp.minimum(kv_length.astype(jnp.int32), skv)

    grid = (b, hkv, num_splits, blocks_per_split)

    kernel = functools.partial(
        _flash_decode_kernel,
        sm_scale=sm_scale,
        window=window,
        logit_softcap=logit_softcap,
        block_kv=block_kv,
        blocks_per_split=blocks_per_split,
        mask_value=DEFAULT_MASK_VALUE,
    )

    bps = blocks_per_split

    # Index maps receive the scalar-prefetch ref as a trailing argument.
    def q_map(b_, h, s, t, lens):
        return (b_, h, 0, 0)

    def kv_map(b_, h, s, t, lens):
        return (b_, h, s * bps + t, 0)

    def part_map(b_, h, s, t, lens):
        return (b_, h, s, 0, 0)

    acc, m_part, l_part = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, g_pad, d_pad), q_map),
                pl.BlockSpec((1, 1, block_kv, d_pad), kv_map),
                pl.BlockSpec((1, 1, block_kv, d_pad), kv_map),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, 1, g_pad, d_pad), part_map),
                pl.BlockSpec((1, 1, 1, g_pad, NUM_LANES), part_map),
                pl.BlockSpec((1, 1, 1, g_pad, NUM_LANES), part_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((g_pad, NUM_LANES), jnp.float32),
                pltpu.VMEM((g_pad, NUM_LANES), jnp.float32),
                pltpu.VMEM((g_pad, d_pad), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, num_splits, g_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, num_splits, g_pad, NUM_LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, num_splits, g_pad, NUM_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        debug=debug,
        name="flash_attention_decode",
    )(lengths, qp, k, v)

    # ---- cross-split online-softmax combine (XLA, negligible cost) ----
    m_s = m_part[..., 0]  # [B, Hkv, S, g_pad]
    l_s = l_part[..., 0]
    m_max = jnp.max(m_s, axis=2, keepdims=True)
    # Dead splits (past the cache length) have m == -inf, l == 0; exp of
    # -inf - finite is 0, so they drop out. Guard -inf - -inf -> NaN.
    w = jnp.where(jnp.isneginf(m_s), 0.0, jnp.exp(m_s - m_max))
    l_tot = jnp.sum(w * l_s, axis=2)  # [B, Hkv, g_pad]
    o = jnp.einsum("bhsgd,bhsg->bhgd", acc, w)
    l_inv = jnp.where(l_tot == 0.0, 1.0, 1.0 / l_tot)
    o = o * l_inv[..., None]

    o = o[:, :, :g, :d].reshape(b, hq, 1, d)
    return o.astype(q.dtype)
