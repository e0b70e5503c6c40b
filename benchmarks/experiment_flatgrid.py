"""Experiment: FLAT-grid diag-first kernel — zero dead grid steps.

The production diag-first kernel runs a rectangular grid
(b, hkv, nq, nkv); rows above the diagonal are dead steps (DMA-clamped,
`pl.when`-skipped) that still cost ~0.5 us each (tpu-kernel memory). At
the S=1024/512-tile headline 1 of 4 steps per (b, h) pair is dead — a
material fraction of a ~100 us kernel. This variant enumerates ONLY the
live (q_block, kv_block) pairs in one flat 'arbitrary' grid axis,
ordered q-major with each row's diagonal first (the anchored-softmax
order); per-step block indices and row-boundary flags come from static
arrays indexed inside the index maps / kernel.

Self-verifying vs the fp32 oracle; interleaved timing vs production.
Run on hardware:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/experiment_flatgrid.py
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


def _kernel_flat(
    qmap_ref,  # [nsteps] int32 scalar-prefetch: q block per flat step
    kvmap_ref,  # [nsteps] int32 scalar-prefetch: kv block per flat step
    q_ref,  # [1, 1, g, block, d]
    k_ref,  # [1, 1, block, d]
    v_ref,  # [1, 1, block, d]
    o_ref,  # [1, 1, g, block, d]
    m_scratch,
    l_scratch,
    acc_scratch,
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
    t = pl.program_id(2)
    sub = block // inner
    offset = kv_len - q_len
    qi = qmap_ref[t]
    kvj = kvmap_ref[t]
    # Row boundaries fall out of the walk order: each row starts at its
    # diagonal block and descends to kv block 0.
    first = kvj == qi + off_blocks
    last = kvj == 0

    @pl.when(first)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

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

    @pl.when(first)
    def _diag_step():
        for si in range(inner):
            fused_this = si < fused_subs
            start = 0 if fused_this else si * sub
            k_sub = k_ref[0, 0, si * sub : (si + 1) * sub]
            v_sub = v_ref[0, 0, si * sub : (si + 1) * sub]
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, (sub, block), 0) + (
                (qi + off_blocks) * block + si * sub
            )
            q_pos = jax.lax.broadcasted_iota(jnp.int32, (sub, block), 1) + (
                qi * block
            )
            allowed = kv_pos <= q_pos + offset
            bias = jnp.where(allowed, 0.0, mask_value).astype(jnp.float32)
            if fused_this:
                q_all = q_ref[0, 0].reshape(block * group, q_ref.shape[-1])
                s_t = jax.lax.dot_general(
                    k_sub, q_all, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s_t += jnp.tile(bias, (1, group))
                softmax_update(s_t, 0, v_sub, strict=(si == 0))
            else:
                for g in range(group):
                    q_g = q_ref[0, 0, g, start:, :]
                    s_t = jax.lax.dot_general(
                        k_sub, q_g, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    s_t += bias[:, start:]
                    softmax_update(
                        s_t, g * block + start, v_sub, strict=(si == 0)
                    )

    @pl.when(jnp.logical_not(first))
    def _interior_step():
        q_all = q_ref[0, 0].reshape(block * group, q_ref.shape[-1])
        for si in range(inner):
            k_sub = k_ref[0, 0, si * sub : (si + 1) * sub]
            v_sub = v_ref[0, 0, si * sub : (si + 1) * sub]
            s_t = jax.lax.dot_general(
                k_sub, q_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            softmax_update(s_t, 0, v_sub, strict=(si == 0))

    @pl.when(last)
    def _store():
        l = l_scratch[:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_t = acc_scratch[...] * l_inv
        o_ref[0, 0] = (
            o_t.T.reshape(group, block, acc_scratch.shape[0])
            .astype(o_ref.dtype)
        )


def flat_attention(q, k, v, *, block=512, inner=4, fused_subs=2,
                   interpret=False):
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv
    sm_scale = d ** -0.5
    q = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)
    assert sq % block == 0 and skv % block == 0 and (skv - sq) % block == 0
    qg = q.reshape(b, hkv, group, sq, d)
    nq = sq // block
    off_blocks = (skv - sq) // block

    # Flat live-step enumeration: per q row, diagonal first then
    # descending interiors (the anchored-softmax order).
    q_of, kv_of = [], []
    for i in range(nq):
        for j in range(i + off_blocks, -1, -1):  # diag .. 0
            q_of.append(i)
            kv_of.append(j)
    nsteps = len(q_of)
    q_arr = jnp.asarray(q_of, jnp.int32)
    kv_arr = jnp.asarray(kv_of, jnp.int32)

    kernel = functools.partial(
        _kernel_flat,
        group=group, block=block, q_len=sq, kv_len=skv,
        off_blocks=off_blocks, mask_value=DEFAULT_MASK_VALUE,
        inner=inner, fused_subs=fused_subs,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv, nsteps),
        in_specs=[
            pl.BlockSpec((1, 1, group, block, d),
                         lambda b_, h, t, qm, km: (b_, h, 0, qm[t], 0)),
            pl.BlockSpec((1, 1, block, d),
                         lambda b_, h, t, qm, km: (b_, h, km[t], 0)),
            pl.BlockSpec((1, 1, block, d),
                         lambda b_, h, t, qm, km: (b_, h, km[t], 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, group, block, d),
                               lambda b_, h, t, qm, km: (b_, h, 0, qm[t], 0)),
        scratch_shapes=[
            pltpu.VMEM((NUM_SUBLANES, group * block), jnp.float32),
            pltpu.VMEM((NUM_SUBLANES, group * block), jnp.float32),
            pltpu.VMEM((d, group * block), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        name="flash_fwd_diag_flat",
    )(q_arr, kv_arr, qg, k, v)
    return out.reshape(b, hq, sq, d)


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    on_tpu = jax.devices()[0].platform == "tpu"

    ks = jax.random.split(jax.random.key(0), 3)
    qs = jax.random.normal(ks[0], (2, 8, 512, 128), jnp.float32)
    kk = jax.random.normal(ks[1], (2, 2, 512, 128), jnp.float32)
    vv = jax.random.normal(ks[2], (2, 2, 512, 128), jnp.float32)
    o = flat_attention(
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
    r = attention_reference(q, k, v, causal=True)
    configs = [
        ("prod", functools.partial(flash_attention_fwd, causal=True)),
        ("flat_f2", functools.partial(flat_attention, fused_subs=2)),
        ("flat_f1", functools.partial(flat_attention, fused_subs=1)),
        ("flat_b256_i2", functools.partial(flat_attention, block=256,
                                           inner=2, fused_subs=1)),
    ]
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
                print(f"[{rep}] {name:14s} {t*1e3:7.3f} ms {tf:6.1f} TF/s "
                      f"({tf/PEAK*1e12*100:4.1f}%) err={err:.2e}",
                      flush=True)
            except Exception as e:
                print(f"[{rep}] {name}: {type(e).__name__}: {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
