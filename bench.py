"""Headline benchmark: attention-kernel TFLOP/s on the reference's default
config (reference: scripts/benchmark_kernel.py:127-136 — B=16, Hq=64,
Hkv=8, Sq=Skv=1024, D=128, Llama-2-7B-like GQA, causal), bf16 on TPU.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline = speedup of the Pallas flash kernel over pure-XLA attention
(the framework-native baseline, analogous to the reference's custom-kernel
vs eager comparison at scripts/benchmark_kernel.py:88-112).

Timing note: on the axon-tunneled TPU, block_until_ready does not block and
host transfers are expensive, so kernels are timed by chaining N iterations
inside one jitted fori_loop (output feeds the next query) and syncing once
on a scalar; per-iteration time is the difference quotient between two
chain lengths, which cancels dispatch/sync overhead.
"""

from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.utils.timing import time_chained


def main():
    from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd
    from flash_attention_cute_tpu.ops.reference import attention_reference

    B, HQ, HKV, S, D = 16, 64, 8, 1024, 128
    causal = True
    dtype = jnp.bfloat16

    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(dtype)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(dtype)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(dtype)

    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        print(
            "WARNING: no TPU attached; reporting XLA reference only",
            file=sys.stderr,
        )

    def chain(attn_fn, n):
        @jax.jit
        def f(q, k, v):
            def body(i, q_):
                # Output feeds the next query: a true data dependency the
                # compiler cannot elide, with bounded values (convex
                # combinations of V rows).
                return attn_fn(q_, k, v).astype(dtype)

            out = jax.lax.fori_loop(0, n, body, q)
            return out[0, 0, 0, 0].astype(jnp.float32)

        return f

    flash_fn = functools.partial(flash_attention_fwd, causal=causal)
    ref_fn = functools.partial(attention_reference, causal=causal)

    # Long chains + repeats: run-to-run variance on the tunneled chip is
    # ±5-10% with short chains.
    t_flash = (
        time_chained(
            lambda n: chain(flash_fn, n), (q, k, v), n1=10, n2=60, repeats=3
        )
        if on_tpu
        else None
    )

    try:
        t_ref = time_chained(lambda n: chain(ref_fn, n), (q, k, v),
                             n1=2, n2=8, repeats=2)
    except Exception as e:  # XLA reference may OOM (4.3 GB scores tensor)
        print(f"reference baseline failed ({type(e).__name__}); "
              "timing at B/4 and scaling", file=sys.stderr)
        qs, ks_, vs = q[:4], k[:4], v[:4]

        def chain_small(n):
            @jax.jit
            def f(qs, ks2, vs2):
                def body(i, q_):
                    return ref_fn(q_, ks2, vs2).astype(dtype)
                out = jax.lax.fori_loop(0, n, body, qs)
                return out[0, 0, 0, 0].astype(jnp.float32)
            return f

        t_ref = 4 * time_chained(chain_small, (qs, ks_, vs),
                                 n1=2, n2=8, repeats=2)

    if t_flash is None:
        t_flash = t_ref

    # Causal attention FLOPs: 2 matmuls x 2 flops x half the score matrix.
    flops = 4 * B * HQ * S * S * D * 0.5
    tflops = flops / t_flash / 1e12

    print(
        json.dumps(
            {
                "metric": "flash_attn_fwd_bf16_causal_B16_H64_S1024_D128",
                "value": round(tflops, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(t_ref / t_flash, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
