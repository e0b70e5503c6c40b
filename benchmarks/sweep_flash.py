"""Flash-attention kernel block-size / variant sweep on the attached TPU.

Usage: python benchmarks/sweep_flash.py
Prints one line per config: TFLOP/s (flops counted over *visited* blocks,
so causal and non-causal utilization are comparable).
"""

import functools
import itertools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd  # noqa: E402


def time_chained(fn, args, n1=4, n2=16, repeats=3):
    def chain(n):
        @jax.jit
        def f(q, k, v):
            def body(i, q_):
                return fn(q_, k, v).astype(q.dtype)
            out = jax.lax.fori_loop(0, n, body, q)
            return out[0, 0, 0, 0].astype(jnp.float32)
        return f

    f1, f2 = chain(n1), chain(n2)
    float(f1(*args)); float(f2(*args))

    def clock(f):
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0

    t1 = min(clock(f1) for _ in range(repeats))
    t2 = min(clock(f2) for _ in range(repeats))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    B, HQ, HKV, S, D = 16, 64, 8, 1024, 128
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)

    print(f"config: B={B} HQ={HQ} HKV={HKV} S={S} D={D} bf16", flush=True)

    for causal, bq, bkv in itertools.product(
        (False, True), (256, 512, 1024), (256, 512, 1024)
    ):
        fn = functools.partial(
            flash_attention_fwd, causal=causal, block_q=bq, block_kv=bkv
        )
        try:
            t = time_chained(fn, (q, k, v))
        except Exception as e:
            print(f"causal={causal} bq={bq} bkv={bkv}: FAIL {type(e).__name__}",
                  flush=True)
            continue
        # Count flops over visited blocks.
        nq, nkv = S // bq, S // bkv
        if causal:
            visited = sum(
                min(nkv, ((i + 1) * bq - 1) // bkv + 1) for i in range(nq)
            )
        else:
            visited = nq * nkv
        flops = 4 * B * HQ * bq * bkv * D * visited
        print(
            f"causal={int(causal)} bq={bq:4d} bkv={bkv:4d}: "
            f"{t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TFLOP/s(visited)",
            flush=True,
        )


if __name__ == "__main__":
    main()
