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
    layer_ref,  # [1] int32, scalar-prefetch: layer index into the stacked cache
    q_ref,  # [1, nh, g_pad, d]
    k_ref,  # [1, 1, nh, block_kv, d] (leading dim: cache layer)
    v_ref,  # [1, 1, nh, block_kv, d]
    o_ref,  # [1, nh, 1, g_pad, d]  unnormalized partial accumulator
    m_ref,  # [1, nh, 1, g_pad, NUM_LANES]
    l_ref,  # [1, nh, 1, g_pad, NUM_LANES]
    m_scratch,  # [nh * g_pad, NUM_LANES] f32
    l_scratch,  # [nh * g_pad, NUM_LANES] f32
    acc_scratch,  # [nh * g_pad, d] f32
    *,
    sm_scale: float,
    window: int | None,
    logit_softcap: float | None,
    block_kv: int,
    num_splits: int,
    mask_value: float,
    kv_cap: int,  # true (unpadded) cache capacity
    nh: int,  # KV heads per grid cell — grid cells run sequentially on
    # the TensorCore, so packing heads costs no parallelism and
    # multiplies per-step DMA size (the short-fill decode-rate lever;
    # see ops/quantized.py _quant_decode_kernel's nh note)
    g_pad: int,
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
    # SPLIT-MINOR (interleaved) block assignment: split s owns blocks
    # s, s+S, s+2S, ... — live blocks spread evenly over splits, so the
    # DYNAMIC grid bound cdiv(cdiv(max_len, block_kv), S) on the t axis
    # trims every step past the live region (dead cache capacity used to
    # cost ~0.5 us of grid overhead per skipped step — the dominant decode
    # overhead at large capacity).
    blk = t * num_splits + split
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
        for hh in range(nh):
            sl = slice(hh * g_pad, (hh + 1) * g_pad)
            q = q_ref[0, hh]  # [g_pad, d]
            k = k_ref[0, 0, hh]  # [block_kv, d]
            v = v_ref[0, 0, hh]
            if kv_cap % block_kv:
                # The cache's ragged final block is NOT padded host-side
                # (a jnp.pad would copy the whole cache per step); its
                # tail rows are uninitialized memory. p is exactly 0
                # there, but 0 * garbage-NaN = NaN in the PV matmul —
                # zero the V tail.
                rows = (
                    jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
                    + blk_start
                )
                v = jnp.where(rows < kv_cap, v, 0.0)

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

            m_prev = m_scratch[sl]
            l_prev = l_scratch[sl]
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])
            p = jnp.exp(s - m_next[:, :1])
            l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=-1,
                                                     keepdims=True)

            m_scratch[sl] = m_next
            l_scratch[sl] = jnp.broadcast_to(l_next, l_prev.shape)
            acc_scratch[sl] *= alpha
            acc_scratch[sl] += jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(t == pl.num_programs(3) - 1)
    def _store():
        d_pad = acc_scratch.shape[-1]
        o_ref[0, :, 0] = acc_scratch[...].reshape(nh, g_pad, d_pad)
        m_ref[0, :, 0] = m_scratch[...].reshape(nh, g_pad, -1)
        l_ref[0, :, 0] = l_scratch[...].reshape(nh, g_pad, -1)


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
    layer: jax.Array | None = None,
    interpret: bool = False,
    debug: bool = False,
) -> jax.Array:
    """Single-token decode attention over a (possibly partially filled) cache.

    Args:
      q: [B, Hq, 1, D]
      k: [B, Hkv, Skv, D] KV cache (padded to capacity), or — with `layer`
        — the FULL stacked cache [L, B, Hkv, Skv, D]. The stacked form
        exists so a scan-over-layers decode can hand the kernel the whole
        carry and a traced layer index: slicing the layer out host-side
        (dynamic_index_in_dim) copies the entire layer slab every step
        (~0.5 GB at 4k capacity), which dominated decode time.
      v: like k.
      kv_length: [B] int32 valid lengths; None means the cache is full.
      window: sliding-window size — only the last `window` cache positions
        are attended (reference raises on sliding windows,
        models/modeling_qwen2.py:261-269; here native).
      num_splits: KV-axis parallel splits; 0 picks a heuristic.
      layer: traced scalar int32 selecting the cache layer (requires the
        5-D stacked k/v layout).

    Returns: [B, Hq, 1, D] in q's dtype.
    """
    b, hq, sq, d = q.shape
    if k.ndim == 4:
        assert layer is None
        k = k[None]
        v = v[None]
        layer = jnp.zeros((), jnp.int32)
    assert k.ndim == 5 and layer is not None
    _, _, hkv, skv, _ = k.shape
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
        qp = jnp.pad(qp, [(0, 0)] * 3 + [(0, d_pad - d)])
        # NB: padding a STACKED cache copies all layers — d < 128 models
        # should prefer the per-layer (4-D) form on the hot path.
        pad5 = [(0, 0)] * 4 + [(0, d_pad - d)]
        k = jnp.pad(k, pad5)
        v = jnp.pad(v, pad5)
    # The KV seq axis is deliberately NOT padded to a block multiple:
    # jnp.pad would copy the ENTIRE cache every decode step (measured
    # +6.8 ms/token on an 8-layer 8B-width model at 4160-token capacity —
    # the whole gap to the weights-streaming floor). Pallas handles the
    # ragged trailing block natively, and the in-kernel `cols < length`
    # mask already covers its garbage tail.

    if kv_length is None:
        lengths = jnp.full((b,), skv, jnp.int32)
    else:
        lengths = jnp.minimum(kv_length.astype(jnp.int32), skv)

    # DYNAMIC grid bound on the block axis: only live blocks (up to the
    # batch's max fill) get grid steps — dead cache capacity costs nothing
    # (neither DMA nor grid-step overhead). Interleaved split assignment
    # (blk = t * num_splits + s) keeps the live blocks evenly spread.
    num_t = jnp.maximum(
        pl.cdiv(pl.cdiv(jnp.max(lengths), block_kv), num_splits), 1
    )

    # KV heads per grid cell: as many as keep the per-step KV DMA under
    # ~2 MB (sequential grid — costs no parallelism, multiplies DMA
    # size; the short-fill decode-rate lever). Must divide hkv.
    itemsize = jnp.dtype(k.dtype).itemsize
    nh = max(1, min(hkv, (2 * 1024 * 1024) // (block_kv * d_pad * itemsize)))
    while hkv % nh:
        nh -= 1
    grid = (b, hkv // nh, num_splits, num_t)

    kernel = functools.partial(
        _flash_decode_kernel,
        sm_scale=sm_scale,
        window=window,
        logit_softcap=logit_softcap,
        block_kv=block_kv,
        num_splits=num_splits,
        mask_value=DEFAULT_MASK_VALUE,
        kv_cap=skv,
        nh=nh,
        g_pad=g_pad,
    )

    ns = num_splits

    # Index maps receive the scalar-prefetch refs as trailing arguments.
    def q_map(b_, h, s, t, lens, lay):
        return (b_, h, 0, 0)

    def kv_blk(b_, s, t, lens):
        # Clamp dead blocks (past this sequence's valid length / below the
        # window) to the nearest live block: revisited indices elide the
        # HBM->VMEM copy, so shorter-than-max sequences stream only their
        # own live cache.
        blk = t * ns + s
        last = jnp.maximum(pl.cdiv(lens[b_], block_kv) - 1, 0)
        blk = jnp.minimum(blk, last)
        if window is not None:
            first = jnp.maximum(lens[b_] - window, 0) // block_kv
            blk = jnp.maximum(blk, jnp.minimum(first, last))
        return blk

    def kv_map(b_, h, s, t, lens, lay):
        return (lay[0], b_, h, kv_blk(b_, s, t, lens), 0)

    def part_map(b_, h, s, t, lens, lay):
        return (b_, h, s, 0, 0)

    acc, m_part, l_part = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, nh, g_pad, d_pad), q_map),
                pl.BlockSpec((1, 1, nh, block_kv, d_pad), kv_map),
                pl.BlockSpec((1, 1, nh, block_kv, d_pad), kv_map),
            ],
            out_specs=[
                pl.BlockSpec((1, nh, 1, g_pad, d_pad), part_map),
                pl.BlockSpec((1, nh, 1, g_pad, NUM_LANES), part_map),
                pl.BlockSpec((1, nh, 1, g_pad, NUM_LANES), part_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((nh * g_pad, NUM_LANES), jnp.float32),
                pltpu.VMEM((nh * g_pad, NUM_LANES), jnp.float32),
                pltpu.VMEM((nh * g_pad, d_pad), jnp.float32),
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
    )(lengths, jnp.asarray(layer, jnp.int32).reshape(1), qp, k, v)

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
