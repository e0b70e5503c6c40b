"""Experiment: q-major lane packing INSIDE the diag-first kernel.

ROADMAP round-3 untried lever. The production diag-first kernel's
diagonal step runs a PER-HEAD loop over suffix-sliced matmuls (8 narrow
matmuls at the headline shape) because in head-major lane order each
head's live-q suffix is a separate lane range. Host-side repacking to
q-major order (lane = pos * group + head) measured 1.3 ms — a dead end.
This experiment transposes the q tile ONCE IN-KERNEL at grid step 0
(amortized over the row's KV steps) so every diagonal suffix is a single
contiguous lane range and the whole diag step becomes one wide sliced
matmul per sub-block; interior steps are identical-width matmuls either
way; the output transposes back at store time.

Self-verifying vs the fp32 oracle; interleaved timing vs the production
kernel at the headline shape. Run on hardware:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/experiment_qmajor.py
"""
from __future__ import annotations

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_cute_tpu.ops.flash_fwd import (
    DEFAULT_MASK_VALUE,
    LOG2E,
    NUM_SUBLANES,
    UNANCHORED,
    flash_attention_fwd,
)
from flash_attention_cute_tpu.ops.reference import attention_reference
from flash_attention_cute_tpu.utils.timing import chain_attention, time_chained

PEAK = 197e12


def _kernel_qmajor(
    q_ref,  # [1, 1, g, block, d] head-major (production layout)
    k_ref,  # [1, 1, block, d]
    v_ref,  # [1, 1, block, d]
    o_ref,  # [1, 1, g, block, d]
    m_scratch,  # [NUM_SUBLANES, g * block] f32, Q-MAJOR lane order
    l_scratch,
    acc_scratch,  # [d, g * block] f32, q-major lanes
    qm_scratch,  # [g * block, d] — q-major repacked q tile
    *,
    group: int,
    block: int,
    q_len: int,
    kv_len: int,
    off_blocks: int,
    mask_value: float,
    inner: int,
    fused_subs: int,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)
    sub = block // inner
    offset = kv_len - q_len
    width = group * block
    d = q_ref.shape[-1]

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)
        # In-kernel q-major repack: lane l <-> (pos = l // group,
        # head = l % group). One [block, group, d] relayout per grid row,
        # amortized over the row's KV steps.
        qm_scratch[...] = (
            q_ref[0, 0].transpose(1, 0, 2).reshape(width, d)
        )

    def softmax_update(s_t, lo, v_blk, strict):
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

    @pl.when(j == 0)
    def _diag_step():
        for si in range(inner):
            fused_this = si < fused_subs
            start = 0 if fused_this else si * sub  # live-q start position
            lane0 = start * group
            k_sub = k_ref[0, 0, si * sub : (si + 1) * sub]
            v_sub = v_ref[0, 0, si * sub : (si + 1) * sub]
            # Bias directly in q-major lane order: lane -> position via a
            # (constant power-of-two) integer divide.
            w = width - lane0
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, (sub, w), 0) + (
                (i + off_blocks) * block + si * sub
            )
            lane = jax.lax.broadcasted_iota(jnp.int32, (sub, w), 1) + lane0
            q_pos = lane // group + i * block
            allowed = kv_pos <= q_pos + offset
            bias = jnp.where(allowed, 0.0, mask_value).astype(jnp.float32)
            s_t = jax.lax.dot_general(
                k_sub, qm_scratch[lane0:, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [sub, w] — ONE wide matmul regardless of group
            s_t += bias
            softmax_update(s_t, lane0, v_sub, strict=(si == 0))

    @pl.when(jnp.logical_and(j > 0, j <= i + off_blocks))
    def _interior_step():
        for si in range(inner):
            k_sub = k_ref[0, 0, si * sub : (si + 1) * sub]
            v_sub = v_ref[0, 0, si * sub : (si + 1) * sub]
            s_t = jax.lax.dot_general(
                k_sub, qm_scratch[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            softmax_update(s_t, 0, v_sub, strict=(si == 0))

    @pl.when(j == num_kv_blocks - 1)
    def _store():
        l = l_scratch[:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_t = acc_scratch[...] * l_inv  # [d, width] q-major lanes
        o_ref[0, 0] = (
            o_t.T.reshape(block, group, acc_scratch.shape[0])
            .transpose(1, 0, 2)
            .astype(o_ref.dtype)
        )


def qmajor_attention(q, k, v, *, block=512, inner=4, fused_subs=2,
                     interpret=False):
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv
    sm_scale = d ** -0.5
    q = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)
    assert sq % block == 0 and skv % block == 0 and (skv - sq) % block == 0
    qg = q.reshape(b, hkv, group, sq, d)
    nq = sq // block
    nkv = skv // block
    off_blocks = (skv - sq) // block

    def kv_index_desc(b_, h, i, j):
        return (b_, h, jnp.maximum(i + off_blocks - j, 0), 0)

    kernel = functools.partial(
        _kernel_qmajor,
        group=group, block=block, q_len=sq, kv_len=skv,
        off_blocks=off_blocks, mask_value=DEFAULT_MASK_VALUE,
        inner=inner, fused_subs=fused_subs,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, hkv, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, group, block, d),
                         lambda b_, h, i, j: (b_, h, 0, i, 0)),
            pl.BlockSpec((1, 1, block, d), kv_index_desc),
            pl.BlockSpec((1, 1, block, d), kv_index_desc),
        ],
        out_specs=pl.BlockSpec((1, 1, group, block, d),
                               lambda b_, h, i, j: (b_, h, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((NUM_SUBLANES, group * block), jnp.float32),
            pltpu.VMEM((NUM_SUBLANES, group * block), jnp.float32),
            pltpu.VMEM((d, group * block), jnp.float32),
            pltpu.VMEM((group * block, d), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary",
            ),
        ),
        interpret=interpret,
        name="flash_fwd_diag_qmajor",
    )(qg, k, v)
    return out.reshape(b, hq, sq, d)


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    on_tpu = jax.devices()[0].platform == "tpu"

    # Correctness first (small shape; interpret off-TPU).
    ks = jax.random.split(jax.random.key(0), 3)
    qs = jax.random.normal(ks[0], (2, 8, 256, 128), jnp.float32)
    kk = jax.random.normal(ks[1], (2, 2, 256, 128), jnp.float32)
    vv = jax.random.normal(ks[2], (2, 2, 256, 128), jnp.float32)
    o = qmajor_attention(
        qs.astype(jnp.bfloat16), kk.astype(jnp.bfloat16),
        vv.astype(jnp.bfloat16), block=128, inner=4, fused_subs=2,
        interpret=not on_tpu,
    )
    r = attention_reference(qs, kk, vv, causal=True)
    err = float(jnp.abs(o.astype(jnp.float32) - r).max())
    print(f"parity err={err:.2e} (bf16 tol 3e-2)", flush=True)
    assert err < 3e-2, err

    if not on_tpu:
        print("CPU: correctness only")
        return

    B, HQ, HKV, S, D = 16, 64, 8, 1024, 128
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    fl = 4 * B * HQ * S * S * D / 2

    configs = [
        ("prod", functools.partial(flash_attention_fwd, causal=True)),
        ("qmajor_f2", functools.partial(qmajor_attention, fused_subs=2)),
        ("qmajor_f1", functools.partial(qmajor_attention, fused_subs=1)),
        ("qmajor_f0", functools.partial(qmajor_attention, fused_subs=0)),
        ("qmajor_i8", functools.partial(qmajor_attention, inner=8,
                                        fused_subs=2)),
    ]
    r = attention_reference(q, k, v, causal=True)
    for rep in range(3):
        for name, fn in configs:
            try:
                o = fn(q, k, v)
                err = float(jnp.abs(o.astype(jnp.float32)
                                    - r.astype(jnp.float32)).max())
                t = time_chained(
                    functools.partial(chain_attention, fn, out_dtype=q.dtype),
                    (q, k, v), n1=10, n2=50,
                )
                tf = fl / t / 1e12
                print(f"[{rep}] {name:10s} {t*1e3:7.3f} ms {tf:6.1f} TF/s "
                      f"({tf/PEAK*1e12*100:4.1f}%) err={err:.2e}",
                      flush=True)
            except Exception as e:
                print(f"[{rep}] {name}: {type(e).__name__}: {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
