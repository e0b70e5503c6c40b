"""Round-3 experiment 2: transpose-free diag-first causal scheduling.

experiment_diag.py showed the q-major packed kernel runs at ~103 TF/s
computed-rate, but its host-side pack/unpack transposes (~0.65 ms each on
the 268 MB q/o tensors) erase the win. This version needs NO repacking:

  * head-major layout everywhere (the production layout);
  * each q tile walks KV blocks DESCENDING (diagonal block = grid step 0,
    a static program-id position);
  * interior steps (j >= 1): the production fused wide matmul
    [sub, G*block], completely mask-free;
  * diagonal step (j == 0): a per-head loop — within ONE head, the live-q
    suffix of kv sub-block si is contiguous ([si*sub :]) in head-major
    layout, so the QK^T/PV matmuls narrow per sub-block and skip the dead
    triangle's FLOPs; the softmax statistics update static per-head lane
    slices of the fused scratch.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/experiment_diag2.py [--interp]
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


def _diag2_kernel(
    q_ref,  # [1, 1, g, block, d]  head-major (production layout)
    k_ref,  # [1, 1, block, d]
    v_ref,  # [1, 1, block, d]
    o_ref,  # [1, 1, g, block, d]
    m_scratch,  # [NUM_SUBLANES, g * block] f32
    l_scratch,  # [NUM_SUBLANES, g * block] f32
    acc_scratch,  # [d, g * block] f32
    *,
    group: int,
    block: int,
    q_len: int,
    kv_len: int,
    kv_len_padded: int,
    off_blocks: int,
    mask_value: float,
    inner: int,
    slice_diag: bool,
    diag_mode: str = "perhead",  # perhead | fused | hybrid | hybrid2
    lazy_interior: bool = False,  # no strict re-anchor on interior steps
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)
    sub = block // inner
    offset = kv_len - q_len
    kv_padded = kv_len_padded != kv_len

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    def softmax_update(s_t, lo, v_blk, strict):
        """Online softmax + accumulate on the lane slice [lo : lo + w)."""
        w = s_t.shape[1]
        hi = lo + w
        m_prev = m_scratch[:1, lo:hi]
        if strict:
            m_curr = jnp.max(s_t, axis=0, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p_t = jnp.exp2(s_t - m_next)
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
            p_t = jnp.exp2(jnp.minimum(s_t - m_prev, 110.0))
            p_op = p_t.astype(v_blk.dtype)
            l_tmp = l_scratch[:1, lo:hi] + jnp.sum(p_t, axis=0, keepdims=True)
            m_next = jnp.maximum(m_prev, jnp.max(s_t, axis=0, keepdims=True))
            alpha = jnp.exp2(m_prev - m_next)
            m_scratch[:, lo:hi] = jnp.broadcast_to(m_next, (NUM_SUBLANES, w))
            l_scratch[:, lo:hi] = jnp.broadcast_to(
                l_tmp * alpha, (NUM_SUBLANES, w)
            )
            acc_scratch[:, lo:hi] += jax.lax.dot_general(
                v_blk, p_op, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scratch[:, lo:hi] *= alpha

    @pl.when(j == 0)
    def _diag_step():
        # Diagonal block (kv block index i + off_blocks): within head g,
        # kv sub-block si's live queries are the contiguous suffix
        # [si*sub :] of that head's q rows.
        for si in range(inner):
            start = si * sub if slice_diag else 0
            k_sub = k_ref[0, 0, si * sub : (si + 1) * sub]
            v_sub = v_ref[0, 0, si * sub : (si + 1) * sub]
            # Bias built once per sub-block at full block_q width, then
            # suffix-sliced; shared across heads.
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
            fused_this_sub = (
                diag_mode == "fused"
                or (diag_mode == "hybrid" and start == 0)
                or (diag_mode == "hybrid2" and si < 2)
            )
            if diag_mode == "hybrid2" and si < 2:
                start = 0
            if fused_this_sub:
                q_all = q_ref[0, 0].reshape(block * group, q_ref.shape[-1])
                s_t = jax.lax.dot_general(
                    k_sub, q_all, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [sub, group * block]
                s_t += jnp.tile(bias, (1, group))
                softmax_update(s_t, 0, v_sub, strict=(si == 0))
            else:
                for g in range(group):
                    q_g = q_ref[0, 0, g, start:, :]  # [block - start, d]
                    s_t = jax.lax.dot_general(
                        k_sub, q_g, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [sub, block - start]
                    s_t += bias[:, start:]
                    softmax_update(
                        s_t, g * block + start, v_sub, strict=(si == 0)
                    )

    @pl.when(jnp.logical_and(j > 0, j <= i + off_blocks))
    def _interior_step():
        q_all = q_ref[0, 0].reshape(block * group, q_ref.shape[-1])
        for si in range(inner):
            k_sub = k_ref[0, 0, si * sub : (si + 1) * sub]
            v_sub = v_ref[0, 0, si * sub : (si + 1) * sub]
            s_t = jax.lax.dot_general(
                k_sub, q_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            softmax_update(
                s_t, 0, v_sub, strict=(si == 0 and not lazy_interior)
            )

    @pl.when(j == num_kv_blocks - 1)
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
        "block", "inner", "slice_diag", "diag_mode", "lazy_interior",
        "interpret",
    ),
)
def flash_fwd_diag2(
    q, k, v, block=512, inner=4, slice_diag=True, diag_mode="perhead",
    lazy_interior=False, interpret=False,
):
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

    qg = q.reshape(b, hkv, group, sq_pad, d_pad)  # head-major, no transpose
    nq = sq_pad // block
    nkv = skv_pad // block
    off_blocks = offset // block

    def kv_index(b_, h, i, j):
        return (b_, h, jnp.maximum(i + off_blocks - j, 0), 0)

    kernel = functools.partial(
        _diag2_kernel,
        group=group,
        block=block,
        q_len=sq,
        kv_len=skv,
        kv_len_padded=skv_pad,
        off_blocks=off_blocks,
        mask_value=DEFAULT_MASK_VALUE,
        inner=inner,
        slice_diag=slice_diag,
        diag_mode=diag_mode,
        lazy_interior=lazy_interior,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, hkv, nq, nkv),
        in_specs=[
            pl.BlockSpec(
                (1, 1, group, block, d_pad),
                lambda b_, h, i, j: (b_, h, 0, i, 0),
            ),
            pl.BlockSpec((1, 1, block, d_pad), kv_index),
            pl.BlockSpec((1, 1, block, d_pad), kv_index),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group, block, d_pad), lambda b_, h, i, j: (b_, h, 0, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, hkv, group, sq_pad, d_pad), q.dtype
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
                2 * q.size * q.dtype.itemsize
                + (k.size + v.size) * k.dtype.itemsize
            ),
            transcendentals=int(b * hq * sq * skv * 0.5),
        ),
        interpret=interpret,
        name="flash_fwd_diag2",
    )(qg, k, v)

    out = out.reshape(b, hq, sq_pad, d_pad)
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
    return float(jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32)).max())


def main():
    if "--interp" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        for sl in (False, True):
            for S, SKV, blk in [(512, 512, 256), (384, 384, 256),
                                (512, 1024, 256), (512, 512, 512)]:
                err = check(
                    functools.partial(flash_fwd_diag2, interpret=True),
                    S=S, SKV=SKV, block=blk, slice_diag=sl,
                )
                print(f"slice={sl} S={S} SKV={SKV} blk={blk} err={err:.2e}",
                      flush=True)
        return

    from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd
    from flash_attention_cute_tpu.utils.timing import chain_attention, time_chained

    import os
    B, HQ, HKV, S, D = 16, 64, 8, 1024, 128
    if os.environ.get("DIAG_LONG"):
        B, HQ, HKV, S, D = 4, 32, 8, 4096, 128
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    fl = 4 * B * HQ * S * S * D * 0.5

    variants = [
        ("hybrid2_lazyint", functools.partial(
            flash_fwd_diag2, block=512, inner=4, slice_diag=True,
            diag_mode="hybrid2", lazy_interior=True)),
        ("hybrid2_again", functools.partial(
            flash_fwd_diag2, block=512, inner=4, slice_diag=True,
            diag_mode="hybrid2")),
        ("hybrid_lazyint", functools.partial(
            flash_fwd_diag2, block=512, inner=4, slice_diag=True,
            diag_mode="hybrid", lazy_interior=True)),
    ]
    for name, fn in variants:
        try:
            err = check(fn)
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
