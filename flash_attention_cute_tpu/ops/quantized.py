"""Quantized-KV-cache attention (int8 / fp8 values + per-token scales).

Completes the reference's "quantized dtype kernels" roadmap item
(reference: README.md:22) TPU-natively, for the decode path where KV-cache
HBM bandwidth dominates: int8/fp8 halves (vs bf16) the bytes streamed per
token, which is a direct speedup for the memory-bound phases.

Dequantization never materializes a dequantized KV block. With per-token
scales s_j:

    S_ij = (q_i . k_j) * kscale_j        fold into the score tile
    O_i  = sum_j P_ij * vscale_j * v_j   fold into the P tile

Both folds touch [G, block_kv] tiles instead of [block_kv, D] blocks —
G (the packed GQA group, ~8) << D (128), so the fold is ~16x cheaper than
scaling K/V, and the MXU still sees a plain matmul ("dequant fused into
the PV matmul", BASELINE.json north star).

Scales are stored as [B, H, S] (f32); value layouts match the bf16 cache.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_cute_tpu.ops.flash_fwd import (
    DEFAULT_MASK_VALUE,
    NUM_LANES,
    UNANCHORED,
    _round_up,
)

INT8_MAX = 127.0
FP8_E4M3_MAX = 448.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedKV:
    """Quantized tensor + per-token scales.

    values: int8 or float8_e4m3fn, same shape as the original [..., S, D]
    scales: float32 [..., S] such that original ~= values * scales[..., None]
    """

    values: jax.Array
    scales: jax.Array


def quantize_kv(x: jax.Array, dtype=jnp.int8) -> QuantizedKV:
    """Per-token (last-axis) symmetric quantization of [..., S, D]."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # [..., S]
    qmax = INT8_MAX if dtype == jnp.int8 else FP8_E4M3_MAX
    scales = jnp.where(amax == 0.0, 1.0, amax / qmax)
    scaled = x.astype(jnp.float32) / scales[..., None]
    if dtype == jnp.int8:
        values = jnp.round(scaled).astype(jnp.int8)
    else:
        values = scaled.astype(dtype)
    return QuantizedKV(values=values, scales=scales)


def dequantize_kv(q: QuantizedKV, dtype=jnp.float32) -> jax.Array:
    return (q.values.astype(jnp.float32) * q.scales[..., None]).astype(dtype)


def _quant_decode_kernel(
    lengths_ref,  # [B] int32 scalar prefetch
    layer_ref,  # [1] int32 scalar prefetch: layer index into the stacked cache
    q_ref,  # [1, nh, g_pad, d]
    k_ref,  # [1, 1, nh, block_kv, d] int8/fp8 (leading dim: cache layer)
    ks_ref,  # [1, 1, Hkv, block_kv] f32 scales (all heads: TPU block tiling
             # requires the sublane dim be a full axis; the slice is tiny)
    v_ref,  # [1, 1, nh, block_kv, d]
    vs_ref,  # [1, 1, Hkv, block_kv]
    o_ref,  # [1, nh, 1, g_pad, d] partial acc
    m_ref,  # [1, nh, 1, g_pad, LANES]
    l_ref,
    m_scratch,  # [nh * g_pad, LANES]
    l_scratch,
    acc_scratch,  # [nh * g_pad, d]
    *,
    sm_scale: float,
    window: int | None,
    logit_softcap: float | None,
    block_kv: int,
    num_splits: int,
    mask_value: float,
    compute_dtype,
    kv_cap: int,  # true (unpadded) cache capacity
    nh: int,  # KV heads per grid cell: TPU grids run SEQUENTIALLY with
    # DMA pipelining, so packing heads into one cell costs no
    # parallelism and multiplies the per-step DMA size — at serving
    # fills (~1k tokens, 147 KB per single-head slab) the single-head
    # form streamed only ~350 GB/s of the 740 GB/s peak
    # (benchmarks/decode_block_sweep.py; same granularity cliff the
    # qmm tile sweep hit at 256 KB steps).
    g_pad: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    split = pl.program_id(2)
    t = pl.program_id(3)

    @pl.when(t == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    length = lengths_ref[b]
    # Interleaved split assignment + dynamic t bound (ops/flash_decode.py).
    blk = t * num_splits + split
    blk_start = blk * block_kv

    visible = blk_start < length
    if window is not None:
        visible = jnp.logical_and(
            visible, blk_start + block_kv > length - window
        )

    @pl.when(visible)
    def _run():
        cols = None
        for hh in range(nh):
            sl = slice(hh * g_pad, (hh + 1) * g_pad)
            q = q_ref[0, hh]
            # MXU needs matching operand dtypes: cast the quantized block
            # to the compute dtype WITHOUT applying scales (the scale
            # folds into s).
            k = k_ref[0, 0, hh].astype(compute_dtype)
            kscale = ks_ref[0, 0, h * nh + hh].astype(jnp.float32)

            s = jax.lax.dot_general(
                q.astype(compute_dtype), k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [g_pad, block_kv]
            s = s * (kscale[None, :] * sm_scale)
            if logit_softcap is not None:
                # Gemma-style tanh cap (dequant scale already folded into
                # s, so the cap sees true score units) — round-3
                # feature-matrix completion: softcap x int8 KV composes.
                s = jnp.tanh(s * (1.0 / logit_softcap)) * logit_softcap

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

            v = v_ref[0, 0, hh].astype(compute_dtype)
            vscale = vs_ref[0, 0, h * nh + hh].astype(jnp.float32)
            # Fold V's dequant scale into P before the PV matmul.
            pv_in = p * vscale[None, :]
            if kv_cap % block_kv:
                # Ragged final block: the unpadded tail is uninitialized —
                # p is 0 there but 0 * NaN = NaN via a garbage f32 scale;
                # kill the tail columns (int8 values are finite, the scale
                # fold is the NaN path).
                pv_in = jnp.where(cols < kv_cap, pv_in, 0.0)
            pv_in = pv_in.astype(compute_dtype)

            acc_scratch[sl] *= alpha
            acc_scratch[sl] += jax.lax.dot_general(
                pv_in, v, (((1,), (0,)), ((), ())),
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
def flash_attention_decode_quantized(
    q: jax.Array,
    k: QuantizedKV,
    v: QuantizedKV,
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
    """Split-KV decode over a quantized cache.

    Args:
      q: [B, Hq, 1, D] bf16/f16/f32
      k, v: QuantizedKV with values [B, Hkv, Skv, D] (int8 or fp8) and
        scales [B, Hkv, Skv] f32 — or, with `layer`, the FULL stacked cache
        (values [L, B, Hkv, Skv, D], scales [L, B, Hkv, Skv]). As in
        ops/flash_decode.py, the stacked form lets a scan-over-layers decode
        hand the kernel the whole carry plus a traced layer index: slicing
        the layer out host-side (dynamic_index_in_dim) copies the entire
        layer slab every step, which scales with depth (~1.2 GB/step of
        pure copy traffic at full 32-layer 8B shapes).
      layer: traced scalar int32 selecting the cache layer (requires the
        5-D stacked values layout).

    Returns: [B, Hq, 1, D] in q's dtype.
    """
    b, hq, sq, d = q.shape
    if k.values.ndim == 4:
        assert layer is None
        k = QuantizedKV(values=k.values[None], scales=k.scales[None])
        v = QuantizedKV(values=v.values[None], scales=v.scales[None])
        layer = jnp.zeros((), jnp.int32)
    assert k.values.ndim == 5 and layer is not None
    nl, _, hkv, skv, _ = k.values.shape
    assert sq == 1
    assert hq % hkv == 0
    assert k.scales.shape == (nl, b, hkv, skv), k.scales.shape
    if sm_scale is None:
        sm_scale = d ** -0.5

    g = hq // hkv
    g_pad = max(8, _round_up(g, 8))
    d_pad = _round_up(max(d, NUM_LANES), NUM_LANES)
    block_kv = min(block_kv, _round_up(skv, NUM_LANES))
    skv_pad = _round_up(skv, block_kv)
    num_kv_blocks = skv_pad // block_kv

    if num_splits <= 0:
        num_splits = 1
        while b * hkv * num_splits < 16 and num_splits * 2 <= num_kv_blocks:
            num_splits *= 2
    num_splits = min(num_splits, num_kv_blocks)
    blocks_per_split = pl.cdiv(num_kv_blocks, num_splits)
    skv_pad = num_splits * blocks_per_split * block_kv

    qp = q.reshape(b, hkv, g, d)
    if g_pad != g:
        qp = jnp.pad(qp, [(0, 0), (0, 0), (0, g_pad - g), (0, 0)])
    kv_vals = [k.values, v.values]
    kv_scales = [k.scales, v.scales]
    if d_pad != d:
        qp = jnp.pad(qp, [(0, 0)] * 3 + [(0, d_pad - d)])
        # NB: padding a STACKED cache copies all layers — d < 128 models
        # should prefer the per-layer (4-D) form on the hot path.
        kv_vals = [jnp.pad(x, [(0, 0)] * 4 + [(0, d_pad - d)]) for x in kv_vals]
    # KV seq axis NOT padded: a jnp.pad here copies the whole cache every
    # step (see ops/flash_decode.py); Pallas handles the ragged trailing
    # block and `cols < length` masks its garbage.
    kq, vq = kv_vals
    ks, vs = kv_scales

    if kv_length is None:
        lengths = jnp.full((b,), skv, jnp.int32)
    else:
        lengths = jnp.minimum(kv_length.astype(jnp.int32), skv)

    # KV heads per grid cell: as many as keep the per-step KV DMA under
    # ~2 MB (grid cells are sequential on a TensorCore, so this costs no
    # parallelism and multiplies the DMA transfer size — the decode-rate
    # lever at short fills; see _quant_decode_kernel's nh note). Must
    # divide hkv so head blocks tile exactly.
    nh = max(1, min(hkv, (2 * 1024 * 1024) // (block_kv * d_pad)))
    while hkv % nh:
        nh -= 1

    # Dynamic t bound: only live blocks get grid steps (ops/flash_decode.py).
    num_t = jnp.maximum(
        pl.cdiv(pl.cdiv(jnp.max(lengths), block_kv), num_splits), 1
    )
    grid = (b, hkv // nh, num_splits, num_t)
    ns = num_splits

    def q_map(b_, h, s_, t, lens, lay):
        return (b_, h, 0, 0)

    def kv_blk(b_, s_, t, lens):
        # Clamp dead blocks to the nearest live one so their HBM->VMEM
        # copies are elided (see ops/flash_decode.py — without this the
        # kernel streams the full padded capacity every step).
        blk = t * ns + s_
        last = jnp.maximum(pl.cdiv(lens[b_], block_kv) - 1, 0)
        blk = jnp.minimum(blk, last)
        if window is not None:
            first = jnp.maximum(lens[b_] - window, 0) // block_kv
            blk = jnp.maximum(blk, jnp.minimum(first, last))
        return blk

    def kv_map(b_, h, s_, t, lens, lay):
        return (lay[0], b_, h, kv_blk(b_, s_, t, lens), 0)

    def sc_map(b_, h, s_, t, lens, lay):
        return (lay[0], b_, 0, kv_blk(b_, s_, t, lens))

    def part_map(b_, h, s_, t, lens, lay):
        return (b_, h, s_, 0, 0)

    kernel = functools.partial(
        _quant_decode_kernel,
        sm_scale=sm_scale,
        window=window,
        logit_softcap=logit_softcap,
        block_kv=block_kv,
        num_splits=num_splits,
        mask_value=DEFAULT_MASK_VALUE,
        compute_dtype=q.dtype if q.dtype != jnp.float32 else jnp.float32,
        kv_cap=skv,
        nh=nh,
        g_pad=g_pad,
    )

    acc, m_part, l_part = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, nh, g_pad, d_pad), q_map),
                pl.BlockSpec((1, 1, nh, block_kv, d_pad), kv_map),
                pl.BlockSpec((1, 1, hkv, block_kv), sc_map),
                pl.BlockSpec((1, 1, nh, block_kv, d_pad), kv_map),
                pl.BlockSpec((1, 1, hkv, block_kv), sc_map),
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
        name="flash_attention_decode_quantized",
    )(lengths, jnp.asarray(layer, jnp.int32).reshape(1), qp, kq, ks, vq, vs)

    m_s = m_part[..., 0]
    l_s = l_part[..., 0]
    m_max = jnp.max(m_s, axis=2, keepdims=True)
    w = jnp.where(jnp.isneginf(m_s), 0.0, jnp.exp(m_s - m_max))
    l_tot = jnp.sum(w * l_s, axis=2)
    o = jnp.einsum("bhsgd,bhsg->bhgd", acc, w)
    l_inv = jnp.where(l_tot == 0.0, 1.0, 1.0 / l_tot)
    o = o * l_inv[..., None]

    o = o[:, :, :g, :d].reshape(b, hq, 1, d)
    return o.astype(q.dtype)


# ---------------------------------------------------------------------------
# Quantized PAGED attention: int8/fp8 page pool -> 2x KV capacity per chip.
# Page-gather structure mirrors ops/paged_attention.py (double-buffered
# async DMA per page, per-page scale vectors fetched alongside); dequant
# folds into the score / PV tiles exactly like the contiguous quantized
# kernel above.
# ---------------------------------------------------------------------------


def _quant_paged_kernel(
    # scalar prefetch
    lengths_ref,  # [B] int32
    page_tbl_ref,  # [B, pages_per_seq] int32
    # inputs
    q_ref,  # [1, 1, g_pad, d] VMEM
    kp_ref,  # [Hkv, P, ps, d] ANY (HBM) int8/fp8
    ksc_ref,  # [Hkv, P, ps] ANY f32
    vp_ref,
    vsc_ref,
    # outputs
    o_ref,  # [1, 1, g_pad, d] f32
    # scratch
    k_buf,  # [2, ppcb, ps, d]
    ksc_buf,  # [2, ppcb, ps]
    v_buf,
    vsc_buf,
    sem_k, sem_ks, sem_v, sem_vs,
    m_scr, l_scr, acc_scr,
    state_ref,  # SMEM (2,): [buffer index, first-fetch flag]
    *,
    page_size: int,
    ppcb: int,
    sm_scale: float,
    window: int | None,
    logit_softcap: float | None,
    mask_value: float,
    compute_dtype,
):
    from flash_attention_cute_tpu.ops.paged_attention import _fetch_block

    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    num_b = pl.num_programs(0)
    num_h = pl.num_programs(1)

    bk = page_size * ppcb
    length = lengths_ref[b]

    @pl.when((b == 0) & (h == 0) & (i == 0))
    def _global_init():
        state_ref[0] = 0
        state_ref[1] = 1

    @pl.when(i == 0)
    def _seq_init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def fetch_all(b_, i_, slot, h_):
        copies = []
        for ref, buf, sem in (
            (kp_ref, k_buf, sem_k),
            (ksc_ref, ksc_buf, sem_ks),
            (vp_ref, v_buf, sem_v),
            (vsc_ref, vsc_buf, sem_vs),
        ):
            copies += _fetch_block(ref, buf, sem, page_tbl_ref, b_, i_,
                                   slot, ppcb, h_)
        return copies

    def next_live_block(b_, h_, i_):
        within = (i_ + 1) * bk < lengths_ref[b_]
        h_n = jnp.where(within, h_, h_ + 1)
        wrap = h_n == num_h
        h_n = jnp.where(wrap, 0, h_n)
        b_n = jnp.where(wrap, b_ + 1, b_)

        def skip_dead(_, bb):
            dead = jnp.logical_and(
                bb < num_b, lengths_ref[jnp.minimum(bb, num_b - 1)] == 0
            )
            return jnp.where(dead, bb + 1, bb)

        b_n = jax.lax.fori_loop(0, num_b, skip_dead, b_n)
        # New streams start at their window's first live block (a dead
        # prefetch would strand its DMA — see ops/paged_attention.py).
        if window is not None:
            lo = jnp.maximum(
                lengths_ref[jnp.minimum(b_n, num_b - 1)] - window, 0
            ) // bk
        else:
            lo = 0
        i_n = jnp.where(within, i_ + 1, lo)
        return b_n, h_n, i_n

    live = i * bk < length
    if window is not None:
        live = jnp.logical_and(live, (i + 1) * bk > length - window)

    @pl.when(live)
    def _live():
        @pl.when(state_ref[1] == 1)
        def _first_fetch():
            for c in fetch_all(b, i, 0, h):
                c.start()
            state_ref[0] = 0
            state_ref[1] = 0

        slot = state_ref[0]
        b_n, h_n, i_n = next_live_block(b, h, i)

        @pl.when(b_n < num_b)
        def _prefetch():
            for c in fetch_all(b_n, i_n, 1 - slot, h_n):
                c.start()

        for c in (
            _fetch_block(kp_ref, k_buf, sem_k, page_tbl_ref, b, i, slot, ppcb, h)
            + _fetch_block(ksc_ref, ksc_buf, sem_ks, page_tbl_ref, b, i, slot, ppcb, h)
        ):
            c.wait()

        q = q_ref[0, 0]  # [g_pad, d]
        k = k_buf[slot].reshape(bk, -1).astype(compute_dtype)
        kscale = ksc_buf[slot].reshape(bk).astype(jnp.float32)

        s = jax.lax.dot_general(
            q.astype(compute_dtype), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * (kscale[None, :] * sm_scale)
        if logit_softcap is not None:
            s = jnp.tanh(s * (1.0 / logit_softcap)) * logit_softcap

        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * bk
        ok = cols < length
        if window is not None:
            ok &= cols >= length - window
        s = jnp.where(ok, s, mask_value)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])
        p = jnp.exp(s - m_next[:, :1])
        l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

        for c in (
            _fetch_block(vp_ref, v_buf, sem_v, page_tbl_ref, b, i, slot, ppcb, h)
            + _fetch_block(vsc_ref, vsc_buf, sem_vs, page_tbl_ref, b, i, slot, ppcb, h)
        ):
            c.wait()
        v = v_buf[slot].reshape(bk, -1).astype(compute_dtype)
        vscale = vsc_buf[slot].reshape(bk).astype(jnp.float32)

        pv_in = (p * vscale[None, :]).astype(compute_dtype)
        acc_scr[...] *= alpha
        acc_scr[...] += jax.lax.dot_general(
            pv_in, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        state_ref[0] = 1 - slot

        @pl.when((i + 1) * bk >= length)
        def _store():
            l = l_scr[...][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = acc_scr[...] * l_inv

    @pl.when((i == pl.num_programs(2) - 1) & (length == 0))
    def _store_empty():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "window", "logit_softcap", "pages_per_compute_block", "interpret", "debug",
    ),
)
def paged_attention_decode_quantized(
    q: jax.Array,
    k_pages: QuantizedKV,
    v_pages: QuantizedKV,
    lengths: jax.Array,
    page_table: jax.Array,
    sm_scale: float | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
    pages_per_compute_block: int = 0,
    interpret: bool = False,
    debug: bool = False,
) -> jax.Array:
    """Single-token decode over a QUANTIZED paged KV cache.

    Args:
      q: [B, Hq, 1, D]
      k_pages/v_pages: QuantizedKV with values [Hkv, P, page_size, D]
        (int8/fp8) and scales [Hkv, P, page_size] f32.
      lengths: [B] int32; page_table: [B, pages_per_seq] int32.

    Returns: [B, Hq, 1, D] in q's dtype.
    """
    b, hq, sq, d = q.shape
    hkv, num_pages, page_size, dk = k_pages.values.shape
    assert sq == 1 and d == dk and hq % hkv == 0
    assert k_pages.scales.shape == (hkv, num_pages, page_size)
    assert page_size % 8 == 0
    from flash_attention_cute_tpu import dispatch

    if dispatch.on_tpu() and not interpret and page_size % 128 != 0:
        raise ValueError(
            "quantized paged attention requires page_size % 128 == 0 on "
            f"TPU (got {page_size}): the per-page scale vectors must fill "
            "full 128-lane tiles (Mosaic rejects narrower scale buffers); "
            ">=128-token pages are also what DMA efficiency wants"
        )
    if sm_scale is None:
        sm_scale = d ** -0.5

    g = hq // hkv
    g_pad = max(8, _round_up(g, 8))
    d_pad = _round_up(max(d, NUM_LANES), NUM_LANES)

    pages_per_seq = page_table.shape[1]
    if pages_per_compute_block <= 0:
        # int8 pages halve the bytes per DMA, so quantized blocks want to
        # be ~4x larger than bf16's 2048-token target to amortize the
        # doubled DMA count (values + scales): v5e sweep at 8k context:
        # 2048-token blocks 396us, 8192-token 305us (1.23x over bf16).
        pages_per_compute_block = max(1, 8192 // page_size)
    ppcb = min(pages_per_compute_block, pages_per_seq)
    pps_pad = _round_up(pages_per_seq, ppcb)
    if pps_pad != pages_per_seq:
        page_table = jnp.pad(page_table, [(0, 0), (0, pps_pad - pages_per_seq)])
    lengths = jnp.minimum(
        lengths.astype(jnp.int32), pages_per_seq * page_size
    )
    # Dynamic grid bound by the batch's max fill (ops/flash_decode.py).
    num_blocks = jnp.clip(
        pl.cdiv(jnp.max(lengths), page_size * ppcb), 1, pps_pad // ppcb
    )

    qp = q.reshape(b, hkv, g, d)
    if g_pad != g:
        qp = jnp.pad(qp, [(0, 0), (0, 0), (0, g_pad - g), (0, 0)])
    kv = k_pages.values
    vv = v_pages.values
    if d_pad != d:
        qp = jnp.pad(qp, [(0, 0)] * 3 + [(0, d_pad - d)])
        kv = jnp.pad(kv, [(0, 0)] * 3 + [(0, d_pad - d)])
        vv = jnp.pad(vv, [(0, 0)] * 3 + [(0, d_pad - d)])

    compute_dtype = q.dtype if q.dtype != jnp.float32 else jnp.float32

    kernel = functools.partial(
        _quant_paged_kernel,
        page_size=page_size,
        ppcb=ppcb,
        sm_scale=sm_scale,
        window=window,
        logit_softcap=logit_softcap,
        mask_value=DEFAULT_MASK_VALUE,
        compute_dtype=compute_dtype,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hkv, num_blocks),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, g_pad, d_pad),
                    lambda b_, h, i, lens, tbl: (b_, h, 0, 0),
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, g_pad, d_pad),
                lambda b_, h, i, lens, tbl: (b_, h, 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, ppcb, page_size, d_pad), kv.dtype),
                pltpu.VMEM((2, ppcb, page_size), jnp.float32),
                pltpu.VMEM((2, ppcb, page_size, d_pad), vv.dtype),
                pltpu.VMEM((2, ppcb, page_size), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((g_pad, NUM_LANES), jnp.float32),
                pltpu.VMEM((g_pad, NUM_LANES), jnp.float32),
                pltpu.VMEM((g_pad, d_pad), jnp.float32),
                pltpu.SMEM((2,), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g_pad, d_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
        debug=debug,
        name="paged_attention_decode_quantized",
    )(
        lengths, page_table.astype(jnp.int32),
        qp, kv, k_pages.scales, vv, v_pages.scales,
    )

    o = out[:, :, :g, :d].reshape(b, hq, 1, d)
    return o.astype(q.dtype)


# ---------------------------------------------------------------------------
# Quantized paged EXTEND (chunked prefill over quantized pages): the missing
# composition of the two flagship serving features — an engine configured
# with kv_dtype=int8 AND prefill_chunk>0 lands here. Per-row causality and
# the page-gather walk mirror ops/paged_attention._paged_extend_kernel; the
# scale folding mirrors _quant_paged_kernel above.
# ---------------------------------------------------------------------------


def _quant_paged_extend_kernel(
    # scalar prefetch
    q_off_ref,  # [B] int32: global position of the chunk's first row
    kv_len_ref,  # [B] int32: valid length INCLUDING the chunk (q_off + S)
    page_tbl_ref,  # [B, pages_per_seq] int32
    # inputs
    q_ref,  # [1, 1, m_pad, d] VMEM — G*S packed rows
    kp_ref,  # [Hkv, P, ps, d] ANY int8/fp8
    ksc_ref,  # [Hkv, P, ps] ANY f32
    vp_ref,
    vsc_ref,
    # outputs
    o_ref,  # [1, 1, m_pad, d] f32
    clamp_ref,  # [1, 1] f32 — lazy-envelope saturation count (whole call)
    # scratch
    k_buf, ksc_buf, v_buf, vsc_buf,
    sem_k, sem_ks, sem_v, sem_vs,
    m_scr, l_scr, acc_scr,
    state_ref,  # SMEM (2,)
    *,
    page_size: int,
    ppcb: int,
    chunk: int,  # S (rows per head in the packed M dim)
    sm_scale: float,
    window: int | None,
    logit_softcap: float | None,
    mask_value: float,
    compute_dtype,
    inner: int = 1,
):
    from flash_attention_cute_tpu.ops.paged_attention import _fetch_block

    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    num_b = pl.num_programs(0)
    num_h = pl.num_programs(1)

    bk = page_size * ppcb
    q_off = q_off_ref[b]
    length = kv_len_ref[b]

    @pl.when((b == 0) & (h == 0) & (i == 0))
    def _global_init():
        # (1, 1)-shaped store: Mosaic rejects scalar stores to VMEM.
        clamp_ref[:, :] = jnp.zeros((1, 1), jnp.float32)
        state_ref[0] = 0
        state_ref[1] = 1

    @pl.when(i == 0)
    def _seq_init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def fetch_all(b_, i_, slot, h_):
        copies = []
        for ref, buf, sem in (
            (kp_ref, k_buf, sem_k),
            (ksc_ref, ksc_buf, sem_ks),
            (vp_ref, v_buf, sem_v),
            (vsc_ref, vsc_buf, sem_vs),
        ):
            copies += _fetch_block(ref, buf, sem, page_tbl_ref, b_, i_,
                                   slot, ppcb, h_)
        return copies

    def next_live_block(b_, h_, i_):
        # Walk live blocks of (b, h) streams, skipping zero-length slots so
        # every started DMA has a matching wait (see paged_attention.py).
        within = (i_ + 1) * bk < kv_len_ref[b_]
        h_n = jnp.where(within, h_, h_ + 1)
        wrap = h_n == num_h
        h_n = jnp.where(wrap, 0, h_n)
        b_n = jnp.where(wrap, b_ + 1, b_)

        def skip_dead(_, bb):
            dead = jnp.logical_and(
                bb < num_b, kv_len_ref[jnp.minimum(bb, num_b - 1)] == 0
            )
            return jnp.where(dead, bb + 1, bb)

        b_n = jax.lax.fori_loop(0, num_b, skip_dead, b_n)
        # With a window a new stream starts at the block holding the
        # earliest visible key (q_off - window + 1), not block 0.
        if window is not None:
            bsafe = jnp.minimum(b_n, num_b - 1)
            lo = jnp.maximum(q_off_ref[bsafe] - window + 1, 0) // bk
        else:
            lo = 0
        i_n = jnp.where(within, i_ + 1, lo)
        return b_n, h_n, i_n

    live = i * bk < length
    if window is not None:
        live = jnp.logical_and(
            live, (i + 1) * bk > jnp.maximum(q_off - window + 1, 0)
        )

    @pl.when(live)
    def _live():
        @pl.when(state_ref[1] == 1)
        def _first_fetch():
            for c in fetch_all(b, i, 0, h):
                c.start()
            state_ref[0] = 0
            state_ref[1] = 0

        slot = state_ref[0]
        b_n, h_n, i_n = next_live_block(b, h, i)

        @pl.when(b_n < num_b)
        def _prefetch():
            for c in fetch_all(b_n, i_n, 1 - slot, h_n):
                c.start()

        for c in (
            _fetch_block(kp_ref, k_buf, sem_k, page_tbl_ref, b, i, slot, ppcb, h)
            + _fetch_block(ksc_ref, ksc_buf, sem_ks, page_tbl_ref, b, i, slot, ppcb, h)
            + _fetch_block(vp_ref, v_buf, sem_v, page_tbl_ref, b, i, slot, ppcb, h)
            + _fetch_block(vsc_ref, vsc_buf, sem_vs, page_tbl_ref, b, i, slot, ppcb, h)
        ):
            c.wait()

        q = q_ref[0, 0].astype(compute_dtype)  # [m_pad, d], (g, r) packed
        k_full = k_buf[slot].reshape(bk, -1).astype(compute_dtype)
        ks_full = ksc_buf[slot].reshape(bk).astype(jnp.float32)
        v_full = v_buf[slot].reshape(bk, -1).astype(compute_dtype)
        vs_full = vsc_buf[slot].reshape(bk).astype(jnp.float32)

        # Inner sub-blocks + anchored lazy max (see
        # ops/paged_attention._paged_extend_kernel).
        sub = bk // inner
        for si in range(inner):
            k = k_full[si * sub : (si + 1) * sub]
            kscale = ks_full[si * sub : (si + 1) * sub]
            v = v_full[si * sub : (si + 1) * sub]
            vscale = vs_full[si * sub : (si + 1) * sub]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [m_pad, sub]
            s = s * (kscale[None, :] * sm_scale)
            if logit_softcap is not None:
                s = jnp.tanh(s * (1.0 / logit_softcap)) * logit_softcap

            # Causal per ROW: row m is chunk row r = m % chunk at global
            # position q_off + r (ops/paged_attention._paged_extend_kernel).
            cols = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + i * bk + si * sub
            )
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) % chunk
            ok = jnp.logical_and(cols <= q_off + rows, cols < length)
            if window is not None:
                ok = jnp.logical_and(ok, cols > q_off + rows - window)
            s = jnp.where(ok, s, mask_value)

            m_prev = m_scr[...][:, :1]
            if si == 0:
                # Strict sub-block with per-row anchoring (round 3; see
                # ops/paged_attention._paged_extend_kernel).
                m_curr = jnp.max(s, axis=-1, keepdims=True)
                unanchored = m_prev <= UNANCHORED
                m_next = jnp.where(
                    unanchored, m_curr, jnp.maximum(m_prev, m_curr)
                )
                alpha = jnp.where(
                    unanchored, 0.0, jnp.exp(m_prev - m_next)
                )
                p = jnp.exp(s - m_next)
                p = jnp.where(m_next <= UNANCHORED, 0.0, p)
                l_next = alpha * l_scr[...][:, :1] + jnp.sum(
                    p, axis=-1, keepdims=True
                )
                m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
                l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
                acc_scr[...] *= alpha
                acc_scr[...] += jax.lax.dot_general(
                    (p * vscale[None, :]).astype(compute_dtype), v,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                m_ref = jnp.where(m_prev <= UNANCHORED, 0.0, m_prev)
                delta = s - m_ref
                p = jnp.exp(jnp.minimum(delta, 75.0))
                clamp_ref[:, :] += jnp.sum(
                    (delta > 75.0).astype(jnp.float32)
                ).reshape(1, 1)
                l_tmp = l_scr[...][:, :1] + jnp.sum(
                    p, axis=-1, keepdims=True
                )
                row_max = jnp.max(s, axis=-1, keepdims=True)
                m_next = jnp.where(
                    row_max <= UNANCHORED,
                    m_prev,
                    jnp.maximum(m_ref, row_max),
                )
                alpha = jnp.where(
                    m_next <= UNANCHORED, 1.0, jnp.exp(m_ref - m_next)
                )
                m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
                l_scr[...] = jnp.broadcast_to(l_tmp * alpha, l_scr.shape)
                acc_scr[...] += jax.lax.dot_general(
                    (p * vscale[None, :]).astype(compute_dtype), v,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_scr[...] *= alpha

        state_ref[0] = 1 - slot

        @pl.when((i + 1) * bk >= length)
        def _store():
            l = l_scr[...][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = acc_scr[...] * l_inv

    @pl.when((i == pl.num_programs(2) - 1) & (length == 0))
    def _store_empty():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "window", "logit_softcap", "pages_per_compute_block",
        "return_clamps", "interpret", "debug",
    ),
)
def paged_attention_extend_quantized(
    q: jax.Array,
    k_pages: QuantizedKV,
    v_pages: QuantizedKV,
    q_offset: jax.Array,
    kv_length: jax.Array,
    page_table: jax.Array,
    sm_scale: float | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
    pages_per_compute_block: int = 0,
    return_clamps: bool = False,
    interpret: bool = False,
    debug: bool = False,
) -> jax.Array:
    """Chunked prefill over a QUANTIZED paged cache.

    Args:
      q: [B, Hq, S, D] — the chunk's queries (global rows q_offset..+S).
      k_pages/v_pages: QuantizedKV with values [Hkv, P, page_size, D]
        (int8/fp8) and scales [Hkv, P, page_size] f32; the chunk's own K/V
        are already quantized+scattered at positions [q_offset, q_offset+S).
      q_offset / kv_length: [B] int32, kv_length = q_offset + S for active
        sequences, 0 for inactive slots (their output is zeros).
      page_table: [B, pages_per_seq] int32.

    Returns: [B, Hq, S, D] in q's dtype. Causality is top-left within the
    global sequence (col <= q_offset + row), like paged_attention_extend.
    """
    b, hq, sq, d = q.shape
    hkv, num_pages, page_size, dk = k_pages.values.shape
    assert d == dk and hq % hkv == 0
    assert k_pages.scales.shape == (hkv, num_pages, page_size)
    assert page_size % 8 == 0
    from flash_attention_cute_tpu import dispatch

    if dispatch.on_tpu() and not interpret and page_size % 128 != 0:
        raise ValueError(
            "quantized paged attention requires page_size % 128 == 0 on "
            f"TPU (got {page_size}): per-page scale vectors must fill "
            "full 128-lane tiles"
        )
    if sm_scale is None:
        sm_scale = d ** -0.5

    g = hq // hkv
    d_pad = _round_up(max(d, NUM_LANES), NUM_LANES)
    from flash_attention_cute_tpu.ops.paged_attention import (
        _extend_chunk_split,
    )

    sub_sq = _extend_chunk_split(sq, g, d_pad)
    if sub_sq is not None:
        # Packed G*S q block would blow the scoped-VMEM limit: split the
        # chunk axis (see ops/paged_attention.py — identical per-row math,
        # early sub-chunks walk strictly fewer kv blocks).
        off = q_offset.astype(jnp.int32)
        kvl = kv_length.astype(jnp.int32)
        outs = []
        clamp_sum = jnp.zeros((), jnp.float32)
        for lo in range(0, sq, sub_sq):
            hi = min(lo + sub_sq, sq)
            len_sub = jnp.where(kvl > 0, jnp.minimum(kvl, off + hi), 0)
            r = paged_attention_extend_quantized(
                q[:, :, lo:hi], k_pages, v_pages, off + lo, len_sub,
                page_table, sm_scale=sm_scale, window=window,
                logit_softcap=logit_softcap,
                pages_per_compute_block=pages_per_compute_block,
                return_clamps=return_clamps, interpret=interpret,
                debug=debug,
            )
            if return_clamps:
                r, c = r
                clamp_sum = clamp_sum + c
            outs.append(r)
        o = jnp.concatenate(outs, axis=2)
        return (o, clamp_sum) if return_clamps else o

    m = g * sq
    m_pad = max(8, _round_up(m, 8))

    pages_per_seq = page_table.shape[1]
    if pages_per_compute_block <= 0:
        pages_per_compute_block = max(1, 8192 // page_size)
    ppcb = min(pages_per_compute_block, pages_per_seq)
    pps_pad = _round_up(pages_per_seq, ppcb)
    if pps_pad != pages_per_seq:
        page_table = jnp.pad(page_table, [(0, 0), (0, pps_pad - pages_per_seq)])
    kv_length = jnp.minimum(
        kv_length.astype(jnp.int32), pages_per_seq * page_size
    )
    # Dynamic grid bound by the batch's max fill (ops/flash_decode.py).
    num_blocks = jnp.clip(
        pl.cdiv(jnp.max(kv_length), page_size * ppcb), 1, pps_pad // ppcb
    )

    # Pack rows head-major: [B, Hkv, G, S, D] -> [B, Hkv, G*S, D]; pad M.
    qp = q.reshape(b, hkv, g, sq, d).reshape(b, hkv, m, d)
    if m_pad != m:
        qp = jnp.pad(qp, [(0, 0), (0, 0), (0, m_pad - m), (0, 0)])
    kv = k_pages.values
    vv = v_pages.values
    if d_pad != d:
        qp = jnp.pad(qp, [(0, 0)] * 3 + [(0, d_pad - d)])
        kv = jnp.pad(kv, [(0, 0)] * 3 + [(0, d_pad - d)])
        vv = jnp.pad(vv, [(0, 0)] * 3 + [(0, d_pad - d)])

    compute_dtype = q.dtype if q.dtype != jnp.float32 else jnp.float32

    bk_tokens = page_size * ppcb
    inner = 4
    while inner > 1 and (bk_tokens % inner or bk_tokens // inner < 128):
        inner -= 1

    kernel = functools.partial(
        _quant_paged_extend_kernel,
        page_size=page_size,
        ppcb=ppcb,
        chunk=sq,
        sm_scale=sm_scale,
        window=window,
        logit_softcap=logit_softcap,
        mask_value=DEFAULT_MASK_VALUE,
        compute_dtype=compute_dtype,
        inner=inner,
    )

    out, clamps = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, hkv, num_blocks),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, m_pad, d_pad),
                    lambda b_, h, i, qo, kvl, tbl: (b_, h, 0, 0),
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, m_pad, d_pad),
                    lambda b_, h, i, qo, kvl, tbl: (b_, h, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1), lambda b_, h, i, qo, kvl, tbl: (0, 0)
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, ppcb, page_size, d_pad), kv.dtype),
                pltpu.VMEM((2, ppcb, page_size), jnp.float32),
                pltpu.VMEM((2, ppcb, page_size, d_pad), vv.dtype),
                pltpu.VMEM((2, ppcb, page_size), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((m_pad, NUM_LANES), jnp.float32),
                pltpu.VMEM((m_pad, NUM_LANES), jnp.float32),
                pltpu.VMEM((m_pad, d_pad), jnp.float32),
                pltpu.SMEM((2,), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, m_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
        debug=debug,
        name="paged_attention_extend_quantized",
    )(
        q_offset.astype(jnp.int32),
        kv_length,
        page_table.astype(jnp.int32),
        qp, kv, k_pages.scales, vv, v_pages.scales,
    )

    o = out[:, :, :m, :d].reshape(b, hkv, g, sq, d).reshape(b, hq, sq, d)
    o = o.astype(q.dtype)
    if return_clamps:
        return o, clamps[0, 0]
    return o
