"""Round-3 experiment: diag-first causal scheduling.

The round-2 causal headline (71.5-72.7 TF/s) loses 1/3 of its computed
FLOPs to masked work above the diagonal inside straddle tiles (512-tiles
at S=1024). Idea: for each q tile, walk its KV blocks in DESCENDING
order, so the diagonal block is always grid step 0 — a STATIC program-id
position. Then:

  * interior steps (j >= 1) run completely mask-free straight-line code;
  * the diagonal step packs q lanes Q-MAJOR (lane = q * G + g) so KV
    sub-block si's live queries form a contiguous lane SUFFIX
    [si*sub_kv*G :] — the QK^T / PV matmuls and the softmax statistics
    simply narrow per sub-block, skipping the dead triangle's FLOPs
    (computed fraction of the diagonal block: (inner+1)/(2*inner),
    e.g. 62.5% at inner=4) with zero conditionals.

Applicable when causal, window is None, block_q == block_kv, and
(kv_len - q_len) % block_kv == 0 (prefill: offset 0).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/experiment_diag.py [--interp]
"""

from __future__ import annotations

import functools
import math
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = math.log2(math.e)
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_SUBLANES = 8
PEAK = 197e12


def _round_up(x, m):
    return (x + m - 1) // m * m


def _diag_kernel(
    q_ref,  # [1, 1, block, g, d]  q-major packed (pre-scaled)
    k_ref,  # [1, 1, block, d]
    v_ref,  # [1, 1, block, d]
    o_ref,  # [1, 1, block, g, d]  q-major packed
    m_scratch,  # [NUM_SUBLANES, g * block] f32
    l_scratch,  # [NUM_SUBLANES, g * block] f32
    acc_scratch,  # [d, g * block] f32
    *,
    group: int,
    block: int,
    q_len: int,
    kv_len: int,
    kv_len_padded: int,
    off_blocks: int,  # (kv_len - q_len) // block, >= 0
    mask_value: float,
    inner: int,
    slice_diag: bool,
    head_major: bool = False,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)
    sub = block // inner
    offset = kv_len - q_len
    kv_padded = kv_len_padded != kv_len

    @pl.when(j == 0)
    def _init():
        # -inf is safe: sub-block 0 of every KV block runs the strict
        # branch, which anchors m at that sub-block's true max (finite —
        # masked lanes use a finite mask_value). Fixes the negative-
        # underflow edge of the old 0.0 init.
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q_all = q_ref[0, 0].reshape(block * group, q_ref.shape[-1])

    def softmax_update(s_t, start_lane, v_blk, strict):
        """Online-softmax + accumulate on the lane suffix [start_lane:]."""
        w = s_t.shape[1]
        assert w == group * block - start_lane
        m_prev = m_scratch[:1, start_lane:]
        if strict:
            m_curr = jnp.max(s_t, axis=0, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p_t = jnp.exp2(s_t - m_next)
            p_op = p_t.astype(v_blk.dtype)
            l_next = alpha * l_scratch[:1, start_lane:] + jnp.sum(
                p_t, axis=0, keepdims=True
            )
            m_scratch[:, start_lane:] = jnp.broadcast_to(
                m_next, (NUM_SUBLANES, w)
            )
            l_scratch[:, start_lane:] = jnp.broadcast_to(
                l_next, (NUM_SUBLANES, w)
            )
            acc_scratch[:, start_lane:] *= alpha
            acc_scratch[:, start_lane:] += jax.lax.dot_general(
                v_blk, p_op, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # Anchored-lazy: p referenced to the running max from BEFORE
            # this sub-block (known pre-matmul), so QK -> exp2 -> PV is the
            # whole critical path; max tree / alpha / rescale overlap.
            p_t = jnp.exp2(jnp.minimum(s_t - m_prev, 110.0))
            p_op = p_t.astype(v_blk.dtype)
            l_tmp = l_scratch[:1, start_lane:] + jnp.sum(
                p_t, axis=0, keepdims=True
            )
            m_next = jnp.maximum(m_prev, jnp.max(s_t, axis=0, keepdims=True))
            alpha = jnp.exp2(m_prev - m_next)
            m_scratch[:, start_lane:] = jnp.broadcast_to(
                m_next, (NUM_SUBLANES, w)
            )
            l_scratch[:, start_lane:] = jnp.broadcast_to(
                l_tmp * alpha, (NUM_SUBLANES, w)
            )
            acc_scratch[:, start_lane:] += jax.lax.dot_general(
                v_blk, p_op, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scratch[:, start_lane:] *= alpha

    @pl.when(j == 0)
    def _diag_step():
        # Diagonal block: kv block index = i + off_blocks. Within-tile,
        # kv sub-block si's live queries start at q row si*sub.
        for si in range(inner):
            start = si * sub if slice_diag else 0
            start_lane = start * group
            k_sub = k_ref[0, 0, si * sub : (si + 1) * sub]
            v_sub = v_ref[0, 0, si * sub : (si + 1) * sub]
            q_suf = q_all[start_lane:]
            s_t = jax.lax.dot_general(
                k_sub, q_suf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [sub, (block - start) * group]
            # Straight-line bias build (this step always straddles).
            w = group * block - start_lane
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, (sub, w), 0) + (
                (i + off_blocks) * block + si * sub
            )
            if head_major:
                bias_kv = jax.lax.broadcasted_iota(
                    jnp.int32, (sub, block), 0
                ) + ((i + off_blocks) * block + si * sub)
                q_pos1 = jax.lax.broadcasted_iota(
                    jnp.int32, (sub, block), 1
                ) + i * block
                allowed = bias_kv <= q_pos1 + offset
                if kv_padded:
                    allowed &= bias_kv < kv_len
                bias = jnp.where(allowed, 0.0, mask_value).astype(jnp.float32)
                s_t += jnp.tile(bias, (1, group))
            else:
                lane = jax.lax.broadcasted_iota(jnp.int32, (sub, w), 1)
                q_pos = lane // group + (i * block + start)
                allowed = kv_pos <= q_pos + offset
                if kv_padded:
                    allowed &= kv_pos < kv_len
                s_t += jnp.where(allowed, 0.0, mask_value).astype(jnp.float32)
            softmax_update(s_t, start_lane, v_sub, strict=(si == 0))

    @pl.when(jnp.logical_and(j > 0, j <= i + off_blocks))
    def _interior_step():
        for si in range(inner):
            k_sub = k_ref[0, 0, si * sub : (si + 1) * sub]
            v_sub = v_ref[0, 0, si * sub : (si + 1) * sub]
            s_t = jax.lax.dot_general(
                k_sub, q_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            softmax_update(s_t, 0, v_sub, strict=(si == 0))

    @pl.when(j == num_kv_blocks - 1)
    def _store():
        l = l_scratch[:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_t = acc_scratch[...] * l_inv  # [d, g * block]
        d_pad = acc_scratch.shape[0]
        o_ref[0, 0] = o_t.T.reshape(block, group, d_pad).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block", "inner", "slice_diag", "interpret"),
)
def flash_fwd_diag(
    q, k, v, block=512, inner=4, slice_diag=True, interpret=False
):
    """Causal-only diag-first forward. Requires offset % block == 0."""
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv
    sm_scale = d ** -0.5
    offset = skv - sq
    assert offset >= 0 and offset % block == 0

    d_pad = max(_round_up(d, NUM_SUBLANES), 128)
    block = min(block, _round_up(max(sq, skv), 128))
    sq_pad = _round_up(sq, block)
    skv_pad = _round_up(skv, block)
    while inner > 1 and (block % inner != 0 or block // inner < 8):
        inner -= 1

    q = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)
    if d_pad != d:
        pad = [(0, 0)] * 3 + [(0, d_pad - d)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    if sq_pad != sq:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, sq_pad - sq), (0, 0)])
    if skv_pad != skv:
        pad = [(0, 0), (0, 0), (0, skv_pad - skv), (0, 0)]
        k, v = (jnp.pad(x, pad) for x in (k, v))

    # Q-major packing: [B, Hq, S, D] -> [B, Hkv, S, G, D] (lane-major
    # within a block row: q outer, head inner).
    qg = q.reshape(b, hkv, group, sq_pad, d_pad).transpose(0, 1, 3, 2, 4)

    nq = sq_pad // block
    nkv = skv_pad // block
    off_blocks = offset // block

    def kv_index(b_, h, i, j):
        return (b_, h, jnp.maximum(i + off_blocks - j, 0), 0)

    kernel = functools.partial(
        _diag_kernel,
        group=group,
        block=block,
        q_len=sq,
        kv_len=skv,
        kv_len_padded=skv_pad,
        off_blocks=off_blocks,
        mask_value=DEFAULT_MASK_VALUE,
        inner=inner,
        slice_diag=slice_diag,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, hkv, nq, nkv),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block, group, d_pad), lambda b_, h, i, j: (b_, h, i, 0, 0)
            ),
            pl.BlockSpec((1, 1, block, d_pad), kv_index),
            pl.BlockSpec((1, 1, block, d_pad), kv_index),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block, group, d_pad), lambda b_, h, i, j: (b_, h, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, hkv, sq_pad, group, d_pad), q.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((NUM_SUBLANES, group * block), jnp.float32),
            pltpu.VMEM((NUM_SUBLANES, group * block), jnp.float32),
            pltpu.VMEM((d_pad, group * block), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * hq * sq * skv * d_pad * 0.5),
            bytes_accessed=int(
                2 * q.size * q.dtype.itemsize + (k.size + v.size) * k.dtype.itemsize
            ),
            transcendentals=int(b * hq * sq * skv * 0.5),
        ),
        interpret=interpret,
        name="flash_fwd_diag",
    )(qg, k, v)

    # [B, Hkv, S, G, D] -> [B, Hq, S, D]
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, hq, sq_pad, d_pad)
    return out[:, :, :sq, :d]


def check(fn, B=2, HQ=8, HKV=2, S=512, D=128, SKV=None, **kw):
    from flash_attention_cute_tpu.ops.reference import attention_reference

    SKV = SKV or S
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, SKV, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, SKV, D), jnp.float32).astype(jnp.bfloat16)
    o = fn(q, k, v, **kw)
    r = attention_reference(q, k, v, causal=True)
    err = float(jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32)).max())
    return err


def main():
    interp = "--interp" in sys.argv
    if interp:
        jax.config.update("jax_platforms", "cpu")
        for sl in (False, True):
            for S, SKV, blk in [(512, 512, 256), (384, 384, 256),
                                (512, 1024, 256), (512, 512, 512)]:
                err = check(
                    functools.partial(flash_fwd_diag, interpret=True),
                    S=S, SKV=SKV, block=blk, slice_diag=sl,
                )
                print(f"slice={sl} S={S} SKV={SKV} blk={blk} err={err:.2e}",
                      flush=True)
        return

    from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd
    from flash_attention_cute_tpu.utils.timing import chain_attention, time_chained

    B, HQ, HKV, S, D = 16, 64, 8, 1024, 128
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    fl = 4 * B * HQ * S * S * D * 0.5

    variants = [
        ("prod", functools.partial(flash_attention_fwd, causal=True)),
        ("diag_full_b512i4",
         functools.partial(flash_fwd_diag, block=512, inner=4, slice_diag=False)),
        ("diag_slice_b512i4",
         functools.partial(flash_fwd_diag, block=512, inner=4, slice_diag=True)),
        ("diag_slice_b512i8",
         functools.partial(flash_fwd_diag, block=512, inner=8, slice_diag=True)),
        ("diag_slice_b1024i8",
         functools.partial(flash_fwd_diag, block=1024, inner=8, slice_diag=True)),
    ]
    for name, fn in variants:
        try:
            err = check(fn) if name != "prod" else check(
                lambda q_, k_, v_: fn(q_, k_, v_))
            t = time_chained(
                functools.partial(chain_attention, fn, out_dtype=q.dtype),
                (q, k, v), n1=10, n2=50,
            )
            tf = fl / t / 1e12
            print(f"{name:22s} {t*1e3:7.3f} ms {tf:7.1f} TF/s "
                  f"({tf/PEAK*1e12*100:4.1f}%) err={err:.2e}", flush=True)
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
