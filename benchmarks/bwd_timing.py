"""Time the Pallas recompute backward vs the analytic XLA gradient.

VERDICT r2 #8: BASELINE.md records S=8k gradient *parity* but no rate.
This measures hardware TFLOP/s for jax.grad through the fused kernel
(Pallas fwd+bwd, O(S) memory) and, where it fits, the analytic XLA
path (materializes S_q x S_kv fp32 scores per (b, h)).

FLOP accounting: forward = 2 matmuls; backward adds 5 (recomputed QK^T,
dV = P^T dO, dP = dO V^T, dQ = dS K, dK = dS^T Q) -> grad-of-sum runs
7 matmul-equivalents = 3.5x the forward's pair count; causal halves the
live pairs. Reported TFLOP/s counts useful (causal-half) FLOPs, same
convention as bench.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bwd_timing.py
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.ops.autodiff import flash_attention
from flash_attention_cute_tpu.utils.timing import time_chained

PEAK = 197e12


def grad_chain(loss_grad, n):
    """Chained grad steps: dq (renormalized) feeds the next query — a data
    dependency the compiler cannot elide, with bounded values."""

    @jax.jit
    def f(q, k, v):
        def body(i, q_):
            dq, dk, dv = loss_grad(q_, k, v)
            scale = 1.0 / (jnp.max(jnp.abs(dq)) + 1e-6)
            return (dq * scale).astype(q_.dtype)

        out = jax.lax.fori_loop(0, n, body, q)
        return out[0, 0, 0, 0].astype(jnp.float32)

    return f


def run(name, fn, args, fl_useful, n1=3, n2=9):
    t = time_chained(functools.partial(grad_chain, fn), args, n1=n1, n2=n2)
    tf = fl_useful / t / 1e12
    print(f"{name:34s} {t*1e3:8.3f} ms  {tf:6.1f} TF/s "
          f"({tf/PEAK*1e12*100:4.1f}% peak)", flush=True)
    return tf


def main():
    B, HQ, HKV, D = 1, 8, 2, 128
    for S in (4096, 8192):
        ks = jax.random.split(jax.random.key(0), 3)
        shape_q = (B, HQ, S, D)
        shape_kv = (B, HKV, S, D)
        q = jax.random.normal(ks[0], shape_q, jnp.float32).astype(jnp.bfloat16)
        k = jax.random.normal(ks[1], shape_kv, jnp.float32).astype(jnp.bfloat16)
        v = jax.random.normal(ks[2], shape_kv, jnp.float32).astype(jnp.bfloat16)

        # useful (causal-half) matmul-pair FLOPs: fwd 2 matmuls + bwd 5.
        fl_fwd = 4 * B * HQ * S * S * D * 0.5
        fl_tot = fl_fwd * 3.5

        pallas_loss = jax.grad(
            lambda q_, k_, v_: flash_attention(
                q_, k_, v_, None, True, None, None
            ).astype(jnp.float32).sum(),
            argnums=(0, 1, 2),
        )
        print(f"-- S={S} B{B} Hq{HQ} Hkv{HKV} D{D} bf16 causal --")
        tf_b = run(f"pallas fwd+bwd S={S}", pallas_loss, (q, k, v), fl_tot)

        # forward-alone rate at the same geometry, for the bwd/fwd ratio
        from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd
        from flash_attention_cute_tpu.utils.timing import chain_attention
        fwd_fn = functools.partial(flash_attention_fwd, causal=True)
        t_f = time_chained(
            functools.partial(chain_attention, fwd_fn, out_dtype=q.dtype),
            (q, k, v), n1=5, n2=15,
        )
        tf_f = fl_fwd / t_f / 1e12
        print(f"{'pallas fwd alone':34s} {t_f*1e3:8.3f} ms  {tf_f:6.1f} TF/s"
              f"  -> bwd-chain/fwd rate ratio {tf_b/tf_f:.2f}", flush=True)

        if S <= 4096:
            # analytic XLA path (the CPU oracle, forced here on TPU for a
            # wall-clock comparison): fp32 S x S scores per (b, h).
            from flash_attention_cute_tpu.ops import autodiff as AD
            xla_loss = jax.grad(
                lambda q_, k_, v_: _xla_attn(q_, k_, v_).astype(
                    jnp.float32).sum(),
                argnums=(0, 1, 2),
            )
            try:
                run(f"xla analytic grad S={S}", xla_loss, (q, k, v), fl_tot,
                    n1=2, n2=6)
            except Exception as e:
                print(f"xla analytic failed: {type(e).__name__}: "
                      f"{str(e)[:120]}")


def _xla_attn(q, k, v):
    from flash_attention_cute_tpu.ops.reference import attention_reference
    return attention_reference(q, k, v, causal=True)


if __name__ == "__main__":
    main()
