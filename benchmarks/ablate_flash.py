"""Ablation study: cost of each stage of the flash kernel on TPU.

Builds stripped kernel variants (not numerically correct!) to attribute
per-step time: QK matmul only, +softmax, +mask bias, +PV, full.
"""

import functools
import time
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def time_chained(fn, args, n1=4, n2=16, repeats=3):
    def chain(n):
        @jax.jit
        def f(q, k, v):
            def body(i, q_):
                return fn(q_, k, v).astype(q.dtype)
            return jax.lax.fori_loop(0, n, body, q)[0, 0, 0, 0].astype(jnp.float32)
        return f
    f1, f2 = chain(n1), chain(n2)
    float(f1(*args)); float(f2(*args))
    def clock(f):
        t0 = time.perf_counter(); float(f(*args)); return time.perf_counter() - t0
    t1 = min(clock(f1) for _ in range(repeats))
    t2 = min(clock(f2) for _ in range(repeats))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def make_variant(stage, group, block_q, block_kv, d):
    """stage: qk | qk_exp | qk_softmax | qk_pv | full | full_bias"""

    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        kv_blk = pl.program_id(3)
        nkv = pl.num_programs(3)

        @pl.when(kv_blk == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        k = k_ref[0, 0]
        v = v_ref[0, 0]
        if stage == "full_bias":
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            bias = jnp.where(cols <= rows, 0.0, -1e30).astype(jnp.float32)

        for g in range(group):
            q = q_ref[0, 0, g]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if stage == "qk":
                acc_scr[g] += s[:, :128]
                continue
            if stage == "full_bias":
                s += bias
            if stage == "qk_exp":
                p = jnp.exp2(s)
                acc_scr[g] += p[:, :128]
                continue
            m_prev = m_scr[g]
            l_prev = l_scr[g]
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev[:, :1] - m_next[:, :1])
            p = jnp.exp2(s - m_next[:, :1])
            l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
            m_scr[g] = m_next
            l_scr[g] = jnp.broadcast_to(l_next, l_prev.shape)
            if stage == "qk_softmax":
                acc_scr[g] += p[:, :128]
                continue
            acc_scr[g] *= alpha
            acc_scr[g] += jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(kv_blk == nkv - 1)
        def _():
            for g in range(group):
                o_ref[0, 0, g] = acc_scr[g][:, :d].astype(o_ref.dtype)

    def wrapper(q, k, v):
        b, hq, s_, d_ = q.shape
        hkv = k.shape[1]
        qg = q.reshape(b, hkv, group, s_, d_)
        grid = (b, hkv, s_ // block_q, k.shape[2] // block_kv)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, group, block_q, d_),
                             lambda b_, h, i, j: (b_, h, 0, i, 0)),
                pl.BlockSpec((1, 1, block_kv, d_),
                             lambda b_, h, i, j: (b_, h, j, 0)),
                pl.BlockSpec((1, 1, block_kv, d_),
                             lambda b_, h, i, j: (b_, h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, group, block_q, d_),
                                   lambda b_, h, i, j: (b_, h, 0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b, hkv, group, s_, d_), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((group, block_q, 128), jnp.float32),
                pltpu.VMEM((group, block_q, 128), jnp.float32),
                pltpu.VMEM((group, block_q, max(d_, 128)), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            ),
        )(qg, k, v).reshape(b, hq, s_, d_)

    return wrapper


def main():
    B, HQ, HKV, S, D = 16, 64, 8, 1024, 128
    ks = jax.random.split(jax.random.key(0), 3)
    q = (jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32) * 0.05).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    full = 4 * B * HQ * S * S * D

    for bq, bkv in ((256, 512), (256, 1024)):
        for stage in ("qk", "qk_exp", "qk_softmax", "qk_pv_full", "full_bias"):
            st = "full" if stage == "qk_pv_full" else stage
            fn = make_variant(st, 8, bq, bkv, D)
            try:
                t = time_chained(fn, (q, k, v))
            except Exception as e:
                print(f"bq={bq} bkv={bkv} {stage}: FAIL {type(e).__name__}")
                continue
            print(f"bq={bq} bkv={bkv} {stage:12s}: {t*1e3:7.3f} ms "
                  f"({full/t/1e12:6.1f} TF-equiv)", flush=True)


if __name__ == "__main__":
    main()


def make_transposed(group, block_q, block_kv, d, causal=False):
    """Fully-transposed variant: s^T = K Q^T, stats as (1, block_q) lane
    vectors, acc kept as (d, block_q); one transpose at store time."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        q_blk = pl.program_id(2)
        kv_blk = pl.program_id(3)
        nkv = pl.num_programs(3)

        @pl.when(kv_blk == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        if causal:
            should_run = kv_blk * block_kv <= (q_blk + 1) * block_q - 1
        else:
            should_run = True

        @pl.when(should_run)
        def _run():
            k = k_ref[0, 0]
            v = v_ref[0, 0]

            if causal:
                def build_bias():
                    rows = jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 1) + q_blk * block_q
                    cols = jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 0) + kv_blk * block_kv
                    return jnp.where(cols <= rows, 0.0, -1e30).astype(jnp.float32)
                straddles = (kv_blk + 1) * block_kv - 1 > q_blk * block_q
                bias = jax.lax.cond(straddles, build_bias,
                                    lambda: jnp.zeros((block_kv, block_q), jnp.float32))
            else:
                bias = None

            for g in range(group):
                q = q_ref[0, 0, g]  # [block_q, d]
                # s^T [block_kv, block_q]
                sT = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                if bias is not None:
                    sT += bias
                m_prev = m_scr[g]  # [1, block_q] padded to (8,block_q)
                l_prev = l_scr[g]
                m_curr = jnp.max(sT, axis=0, keepdims=True)  # [1, block_q]
                m_next = jnp.maximum(m_prev[:1], m_curr)
                alpha = jnp.exp2(m_prev[:1] - m_next)
                p = jnp.exp2(sT - m_next)  # broadcast along sublanes
                l_next = alpha * l_prev[:1] + jnp.sum(p, axis=0, keepdims=True)
                m_scr[g] = jnp.broadcast_to(m_next, m_prev.shape)
                l_scr[g] = jnp.broadcast_to(l_next, l_prev.shape)
                # acc^T [d, block_q] = V^T @ p
                acc_scr[g] *= alpha  # broadcast (1,bq) over (d,bq)
                acc_scr[g] += jax.lax.dot_general(
                    v, p.astype(v.dtype), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(kv_blk == nkv - 1)
        def _store():
            for g in range(group):
                l = l_scr[g][:1]
                l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
                oT = acc_scr[g] * l_inv  # [d, block_q]
                o_ref[0, 0, g] = oT.T.astype(o_ref.dtype)

    def wrapper(q, k, v):
        b, hq, s_, d_ = q.shape
        hkv = k.shape[1]
        qg = q.reshape(b, hkv, group, s_, d_)
        grid = (b, hkv, s_ // block_q, k.shape[2] // block_kv)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, group, block_q, d_),
                             lambda b_, h, i, j: (b_, h, 0, i, 0)),
                pl.BlockSpec((1, 1, block_kv, d_),
                             lambda b_, h, i, j: (b_, h, j, 0)),
                pl.BlockSpec((1, 1, block_kv, d_),
                             lambda b_, h, i, j: (b_, h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, group, block_q, d_),
                                   lambda b_, h, i, j: (b_, h, 0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b, hkv, group, s_, d_), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((group, 8, block_q), jnp.float32),
                pltpu.VMEM((group, 8, block_q), jnp.float32),
                pltpu.VMEM((group, d_, block_q), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            ),
        )(qg, k, v).reshape(b, hq, s_, d_)

    return wrapper


def main_transposed():
    B, HQ, HKV, S, D = 16, 64, 8, 1024, 128
    ks = jax.random.split(jax.random.key(0), 3)
    q = (jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32) * 0.05).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    full = 4 * B * HQ * S * S * D
    # correctness spot-check vs reference
    from flash_attention_cute_tpu.ops.reference import attention_reference
    fn0 = make_transposed(8, 256, 1024, D, causal=False)
    got = fn0(q, k, v)
    want = attention_reference((q.astype(jnp.float32) * 1.0).astype(jnp.bfloat16), k, v, softmax_scale=1.0/jnp.log(2.0).item()* 0.693147)  # scale=1: q prescaled? no — use raw softmax with scale 1 and exp2 base mismatch
    # NOTE: kernel uses exp2 on unscaled scores -> equivalent to softmax with
    # scale log2e... just check finiteness + compare with exp2-softmax oracle:
    import numpy as np
    sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), jnp.repeat(k.astype(jnp.float32), 8, 1))
    pr = jax.nn.softmax(sc * 1.4426950408889634 * 0.693147, axis=-1)  # ~= exp2(sc)/sum
    print("transposed finite:", bool(np.isfinite(np.asarray(got, np.float32)).all()))
    for causal, bq, bkv in [(False,256,1024),(False,256,512),(False,512,512),(True,256,1024),(True,256,512),(True,256,256),(True,512,512)]:
        fn = make_transposed(8, bq, bkv, D, causal=causal)
        try:
            t = time_chained(fn, (q, k, v))
        except Exception as e:
            print(f"T c={int(causal)} bq={bq} bkv={bkv}: FAIL {type(e).__name__}")
            continue
        eff = full * (0.5 if causal else 1.0)
        print(f"T c={int(causal)} bq={bq:4d} bkv={bkv:4d}: {t*1e3:7.3f} ms "
              f"effective={eff/t/1e12:6.1f} TF", flush=True)


if __name__ == "__main__" and "--transposed" in sys.argv:
    main_transposed()
