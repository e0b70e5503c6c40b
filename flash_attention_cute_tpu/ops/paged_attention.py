"""Paged-attention decode kernel (non-contiguous KV pages, async DMA).

Completes the reference's "paged kv cache (Paged Attention)" roadmap item
(reference: README.md:21) TPU-natively. The cache lives in HBM as
fixed-size pages scattered by a per-sequence page table; the kernel
gathers the pages for one compute block with one async DMA per page (all
in flight concurrently), double-buffered so the next block's pages load
while the current block computes — the same overlap discipline as the
reference's cp.async two-stage pipeline (reference:
csrc/flash_attention_template.cuh:323-385), expressed with Pallas DMA
primitives instead of cp.async.

GQA q-head-group packing is inherited from the dense decode kernel
(reference: csrc/flash_attention_api.cpp:72-83).

Layouts:
  q:            [B, Hkv, G_pad, D]       (packed q-head groups)
  k_pages:      [Hkv, num_pages, page_size, D]  (HBM resident)
  v_pages:      [Hkv, num_pages, page_size, D]
  lengths:      [B] int32
  page_table:   [B, pages_per_seq] int32 (padding entries must be valid
                page ids, e.g. 0 — they are masked, never used)
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
    UNANCHORED,
    _round_up,
)


# VMEM row budget for the packed G*S q block of one extend-kernel
# invocation, in row-equivalents at D=128. The f32 accumulator + m/l stat
# planes + the pipeline-double-buffered q/out blocks cost ~4.6 KB/row at
# D=128: 4096 packed rows measured 18.9 MB against the 16 MB scoped-VMEM
# limit on v5e (bucket-1024 chunks x GQA group 4). Wider head dims scale
# the budget down proportionally.
MAX_EXTEND_ROWS = 2048


def _extend_chunk_split(sq: int, g: int, d_pad: int) -> int | None:
    """Sub-chunk length for the extend wrappers (None = no split needed),
    keeping g*sub packed rows inside the VMEM budget. Splitting the chunk
    axis is exact: causality and the kv walk are both driven by
    (q_offset + row, kv_length), so a sub-call with shifted q_offset and
    causally-clamped kv_length reproduces the same per-row math."""
    max_rows = max(8, MAX_EXTEND_ROWS * NUM_LANES // d_pad)
    if g * sq <= max_rows or sq <= 1:
        return None
    sub = max(1, max_rows // g)
    if sub >= 8:
        sub -= sub % 8
    return sub


def _fetch_block(pages_ref, buf, sem, page_tbl_ref, b, i, slot, ppcb, h):
    """One async copy per page of compute block i of sequence b -> buf[slot].

    Returns the copy descriptors (constructed identically at wait time,
    the standard Pallas multi-page DMA pattern).
    """
    copies = []
    for j in range(ppcb):  # static unroll: ppcb concurrent DMAs
        page = page_tbl_ref[b, i * ppcb + j]
        copies.append(
            pltpu.make_async_copy(
                pages_ref.at[h, page],
                buf.at[slot, j],
                sem.at[slot],
            )
        )
    return copies


def _paged_decode_kernel(
    # scalar prefetch
    lengths_ref,  # [B] int32
    page_tbl_ref,  # [B, pages_per_seq] int32
    # inputs
    q_ref,  # [1, 1, g_pad, d] VMEM
    k_pages_ref,  # [Hkv, P, ps, d] ANY (HBM)
    v_pages_ref,  # [Hkv, P, ps, d] ANY (HBM)
    # outputs
    o_ref,  # [1, 1, g_pad, d] f32
    # scratch
    k_buf,  # [2, ppcb, ps, d] VMEM
    v_buf,  # [2, ppcb, ps, d] VMEM
    sem_k,  # DMA sems (2,)
    sem_v,
    m_scr,  # [g_pad, NUM_LANES] f32
    l_scr,
    acc_scr,  # [g_pad, d] f32
    state_ref,  # SMEM (2,) int32: [buffer_index, init_flag]
    *,
    page_size: int,
    ppcb: int,
    sm_scale: float,
    window: int | None,
    logit_softcap: float | None,
    mask_value: float,
):
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

    def next_live_block(b_, h_, i_):
        """Grid coordinates of the next live (within-length) block.

        Zero-length sequences are skipped entirely: prefetching a dead
        batch's block would leave an async copy that no later cell waits
        on (the consumer reconstructs the copy descriptors, so source and
        wait must match) — un-awaited DMAs at kernel end are an error.
        """
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
        # A new (b, h) stream starts at ITS first live block — with a
        # sliding window that is the block containing length - window, not
        # block 0 (prefetching a dead block would strand its DMA).
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
            for c in _fetch_block(k_pages_ref, k_buf, sem_k, page_tbl_ref,
                                  b, i, 0, ppcb, h):
                c.start()
            for c in _fetch_block(v_pages_ref, v_buf, sem_v, page_tbl_ref,
                                  b, i, 0, ppcb, h):
                c.start()
            state_ref[0] = 0
            state_ref[1] = 0

        slot = state_ref[0]

        # Prefetch the next live block into the other slot while this one
        # computes (double buffering, guide pattern §11).
        b_n, h_n, i_n = next_live_block(b, h, i)

        @pl.when(b_n < num_b)
        def _prefetch():
            for c in _fetch_block(k_pages_ref, k_buf, sem_k, page_tbl_ref,
                                  b_n, i_n, 1 - slot, ppcb, h_n):
                c.start()
            for c in _fetch_block(v_pages_ref, v_buf, sem_v, page_tbl_ref,
                                  b_n, i_n, 1 - slot, ppcb, h_n):
                c.start()

        # Wait for the current block's pages.
        for c in _fetch_block(k_pages_ref, k_buf, sem_k, page_tbl_ref,
                              b, i, slot, ppcb, h):
            c.wait()

        q = q_ref[0, 0]  # [g_pad, d]
        k = k_buf[slot].reshape(bk, -1)  # [bk, d]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s *= sm_scale
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

        for c in _fetch_block(v_pages_ref, v_buf, sem_v, page_tbl_ref,
                              b, i, slot, ppcb, h):
            c.wait()
        v = v_buf[slot].reshape(bk, -1)

        acc_scr[...] *= alpha
        acc_scr[...] += jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        state_ref[0] = 1 - slot

        is_last = (i + 1) * bk >= length

        @pl.when(is_last)
        def _store():
            l = l_scr[...][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = acc_scr[...] * l_inv

    # Sequences shorter than one block never hit is_last at later i, and
    # zero-length sequences never run: emit zeros for them at the final
    # grid step so o_ref is always written.
    @pl.when((i == pl.num_programs(2) - 1) & (length == 0))
    def _store_empty():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "window", "logit_softcap", "pages_per_compute_block",
        "interpret", "debug",
    ),
)
def paged_attention_decode(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_table: jax.Array,
    sm_scale: float | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
    pages_per_compute_block: int = 0,
    interpret: bool = False,
    debug: bool = False,
) -> jax.Array:
    """Single-token decode over a paged KV cache.

    Args:
      q: [B, Hq, 1, D]
      k_pages/v_pages: [Hkv, num_pages, page_size, D]
      lengths: [B] int32 valid token counts
      page_table: [B, pages_per_seq] int32 physical page ids
      pages_per_compute_block: pages gathered per softmax block; 0 targets
        a 2048-token block (v5e sweep: 64-token pages cap at ~480 GB/s
        from 16 KB DMAs; 128-token pages x 16 reach ~740 GB/s — prefer
        page_size >= 128 on TPU).

    Returns: [B, Hq, 1, D] in q's dtype.
    """
    b, hq, sq, d = q.shape
    hkv, num_pages, page_size, dk = k_pages.shape
    assert sq == 1, sq
    assert d == dk and hq % hkv == 0
    assert page_size % 8 == 0, "page_size must be a multiple of 8 sublanes"
    if sm_scale is None:
        sm_scale = d ** -0.5

    g = hq // hkv
    g_pad = max(8, _round_up(g, 8))
    d_pad = _round_up(max(d, NUM_LANES), NUM_LANES)

    pages_per_seq = page_table.shape[1]
    if pages_per_compute_block <= 0:
        pages_per_compute_block = max(1, 2048 // page_size)
    ppcb = min(pages_per_compute_block, pages_per_seq)
    # Pad the page table so compute blocks tile evenly.
    pps_pad = _round_up(pages_per_seq, ppcb)
    if pps_pad != pages_per_seq:
        page_table = jnp.pad(page_table, [(0, 0), (0, pps_pad - pages_per_seq)])

    qp = q.reshape(b, hkv, g, d)
    if g_pad != g:
        qp = jnp.pad(qp, [(0, 0), (0, 0), (0, g_pad - g), (0, 0)])
    if d_pad != d:
        qp = jnp.pad(qp, [(0, 0)] * 3 + [(0, d_pad - d)])
        k_pages = jnp.pad(k_pages, [(0, 0)] * 3 + [(0, d_pad - d)])
        v_pages = jnp.pad(v_pages, [(0, 0)] * 3 + [(0, d_pad - d)])

    lengths = jnp.minimum(
        lengths.astype(jnp.int32), pages_per_seq * page_size
    )
    # DYNAMIC grid bound: only compute blocks up to the batch's max fill
    # get grid steps (dead pool capacity used to cost ~0.5 us of grid
    # overhead per skipped step — see ops/flash_decode.py).
    num_blocks = jnp.clip(
        pl.cdiv(jnp.max(lengths), page_size * ppcb), 1, pps_pad // ppcb
    )

    kernel = functools.partial(
        _paged_decode_kernel,
        page_size=page_size,
        ppcb=ppcb,
        sm_scale=sm_scale,
        window=window,
        logit_softcap=logit_softcap,
        mask_value=DEFAULT_MASK_VALUE,
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
            ],
            out_specs=pl.BlockSpec(
                (1, 1, g_pad, d_pad),
                lambda b_, h, i, lens, tbl: (b_, h, 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, ppcb, page_size, d_pad), k_pages.dtype),
                pltpu.VMEM((2, ppcb, page_size, d_pad), v_pages.dtype),
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
        name="paged_attention_decode",
    )(lengths, page_table.astype(jnp.int32), qp, k_pages, v_pages)

    o = out[:, :, :g, :d].reshape(b, hq, 1, d)
    return o.astype(q.dtype)


# ---------------------------------------------------------------------------
# Paged EXTEND (chunked prefill over pages): a chunk of S new queries
# attends the paged prefix PLUS its own already-scattered K/V. This is the
# kernel behind chunked admission in the serving engine (ROADMAP.md):
# admission can interleave prompt chunks with decode rounds instead of
# stalling the batch on one long prefill.
# ---------------------------------------------------------------------------


def _paged_extend_kernel(
    # scalar prefetch
    q_off_ref,  # [B] int32: global position of the chunk's first row
    kv_len_ref,  # [B] int32: valid length INCLUDING the chunk (q_off + S)
    page_tbl_ref,  # [B, pages_per_seq] int32
    # inputs
    q_ref,  # [1, 1, m_pad, d] VMEM — G*S packed rows (pre-transposed)
    k_pages_ref,  # [Hkv, P, ps, d] ANY
    v_pages_ref,
    # outputs
    o_ref,  # [1, 1, m_pad, d] f32
    clamp_ref,  # [1, 1] f32 — lazy-envelope saturation count (whole call)
    # scratch
    k_buf, v_buf, sem_k, sem_v,
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
    inner: int = 1,
):
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
        state_ref[0] = 0
        state_ref[1] = 1
        # (1, 1)-shaped store: Mosaic rejects scalar stores to VMEM.
        clamp_ref[:, :] = jnp.zeros((1, 1), jnp.float32)

    @pl.when(i == 0)
    def _seq_init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def next_live_block(b_, h_, i_):
        # Identical structure to _paged_decode_kernel: walk the live blocks
        # of (b, h) streams, skipping zero-length (inactive) sequences so
        # no DMA is ever started without a matching wait.
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
        # With a window, a new stream's first live block is the one holding
        # the earliest visible key (q_off - window + 1) — starting at 0
        # would strand its prefetch DMA.
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
            for c in _fetch_block(k_pages_ref, k_buf, sem_k, page_tbl_ref,
                                  b, i, 0, ppcb, h):
                c.start()
            for c in _fetch_block(v_pages_ref, v_buf, sem_v, page_tbl_ref,
                                  b, i, 0, ppcb, h):
                c.start()
            state_ref[0] = 0
            state_ref[1] = 0

        slot = state_ref[0]
        b_n, h_n, i_n = next_live_block(b, h, i)

        @pl.when(b_n < num_b)
        def _prefetch():
            for c in _fetch_block(k_pages_ref, k_buf, sem_k, page_tbl_ref,
                                  b_n, i_n, 1 - slot, ppcb, h_n):
                c.start()
            for c in _fetch_block(v_pages_ref, v_buf, sem_v, page_tbl_ref,
                                  b_n, i_n, 1 - slot, ppcb, h_n):
                c.start()

        for c in _fetch_block(k_pages_ref, k_buf, sem_k, page_tbl_ref,
                              b, i, slot, ppcb, h):
            c.wait()
        for c in _fetch_block(v_pages_ref, v_buf, sem_v, page_tbl_ref,
                              b, i, slot, ppcb, h):
            c.wait()

        q = q_ref[0, 0]  # [m_pad, d], rows packed (g, r) head-major
        k_full = k_buf[slot].reshape(bk, -1)
        v_full = v_buf[slot].reshape(bk, -1)

        # Inner sub-blocks + anchored lazy max (structure transplant from
        # ops/flash_fwd.py, natural-log units here): sub-block 0 anchors
        # the running max strictly, later sub-blocks reference it lazily
        # so their max tree and rescale overlap the matmuls.
        sub = bk // inner
        for si in range(inner):
            k = k_full[si * sub : (si + 1) * sub]
            v = v_full[si * sub : (si + 1) * sub]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [m_pad, sub]
            s *= sm_scale
            if logit_softcap is not None:
                # Gemma-style tanh cap, natural units (pre-mask), matching
                # the prefill kernel's semantics (ops/flash_fwd.py).
                s = jnp.tanh(s * (1.0 / logit_softcap)) * logit_softcap

            # Causal per ROW: row m corresponds to chunk row r = m % chunk
            # at global position q_off + r; key col visible iff
            # col <= q_off + r and col < length (padding rows r >= real S
            # mask via length too — their outputs are trimmed on the host).
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
                # Strict sub-block with per-row ANCHORING (round 3, the
                # structure of ops/flash_fwd.py): rows whose running max
                # still sits at the unanchored sentinel take this
                # sub-block's true max outright (alpha washes any prior
                # pollution to exact 0); rows with no live score yet stay
                # at the sentinel and contribute exact 0.
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
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                # Lazy: 75 nats ~ the f32 exp overflow guard (anchored, so
                # only within-block spread can reach it; see flash_fwd.py).
                # Rows not yet anchored (window/masked-start geometry only)
                # reference 0 instead of the sentinel — the sentinel would
                # saturate every live score at the clamp.
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
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
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
def paged_attention_extend(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
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
    """Chunked prefill over a paged cache.

    Args:
      q: [B, Hq, S, D] — the chunk's queries (global rows q_offset..+S).
      k_pages/v_pages: [Hkv, P, page_size, D] with the chunk's K/V already
        scattered at positions [q_offset, q_offset + S).
      q_offset: [B] int32; kv_length: [B] int32 = q_offset + S for active
        sequences, 0 for inactive slots (their output is zeros).
      page_table: [B, pages_per_seq] int32.
      logit_softcap: Gemma-style tanh soft-capping of the scaled scores
        (round-3 feature-matrix completion; the prefill/decode kernels
        already had it).
      return_clamps: additionally return a scalar f32 count of score
        entries that exceeded the 75-nat lazy-softmax envelope across the
        whole call (0 = exact; surfaced by ServingEngine.stats).

    Returns: [B, Hq, S, D] in q's dtype (with return_clamps, a tuple
    (out, clamps)). Causality is top-left within the global sequence
    (col <= q_offset + row), like ops/flash_chunked.py.
    """
    b, hq, sq, d = q.shape
    hkv, num_pages, page_size, dk = k_pages.shape
    assert d == dk and hq % hkv == 0
    assert page_size % 8 == 0
    if sm_scale is None:
        sm_scale = d ** -0.5

    g = hq // hkv
    d_pad = _round_up(max(d, NUM_LANES), NUM_LANES)
    sub_sq = _extend_chunk_split(sq, g, d_pad)
    if sub_sq is not None:
        # Packed G*S q block would blow the scoped-VMEM limit: split the
        # chunk axis. Each sub-call shifts q_offset and clamps kv_length
        # to the sub-chunk's causal horizon — per-row math is identical
        # to the single call (keys past a row's horizon are fully masked
        # and contribute exact zeros), and early sub-chunks walk strictly
        # fewer kv blocks.
        off = q_offset.astype(jnp.int32)
        kvl = kv_length.astype(jnp.int32)
        outs = []
        clamp_sum = jnp.zeros((), jnp.float32)
        for lo in range(0, sq, sub_sq):
            hi = min(lo + sub_sq, sq)
            len_sub = jnp.where(kvl > 0, jnp.minimum(kvl, off + hi), 0)
            r = paged_attention_extend(
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
        pages_per_compute_block = max(1, 2048 // page_size)
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
    if d_pad != d:
        qp = jnp.pad(qp, [(0, 0)] * 3 + [(0, d_pad - d)])
        k_pages = jnp.pad(k_pages, [(0, 0)] * 3 + [(0, d_pad - d)])
        v_pages = jnp.pad(v_pages, [(0, 0)] * 3 + [(0, d_pad - d)])

    # Inner sub-blocks for the anchored-lazy overlap; sub-blocks want full
    # 128-lane score tiles, fall back to fewer splits for small pools.
    bk_tokens = page_size * ppcb
    inner = 4
    while inner > 1 and (bk_tokens % inner or bk_tokens // inner < 128):
        inner -= 1

    kernel = functools.partial(
        _paged_extend_kernel,
        page_size=page_size,
        ppcb=ppcb,
        chunk=sq,
        sm_scale=sm_scale,
        window=window,
        logit_softcap=logit_softcap,
        mask_value=DEFAULT_MASK_VALUE,
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
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, m_pad, d_pad),
                    lambda b_, h, i, qo, kvl, tbl: (b_, h, 0, 0),
                ),
                pl.BlockSpec((1, 1), lambda b_, h, i, qo, kvl, tbl: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, ppcb, page_size, d_pad), k_pages.dtype),
                pltpu.VMEM((2, ppcb, page_size, d_pad), v_pages.dtype),
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
        name="paged_attention_extend",
    )(
        q_offset.astype(jnp.int32),
        kv_length,
        page_table.astype(jnp.int32),
        qp, k_pages, v_pages,
    )

    o = out[:, :, :m, :d].reshape(b, hkv, g, sq, d).reshape(b, hq, sq, d)
    o = o.astype(q.dtype)
    if return_clamps:
        return o, clamps[0, 0]
    return o
