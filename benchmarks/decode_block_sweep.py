"""block_kv / num_splits sweep for the stacked-cache quantized decode kernel.

layer_overhead.py measured the decode attention kernel at ~89 us/layer
vs a ~26 us byte floor at the full-depth serving shape (B8 Hkv8 fill
1024, capacity 1152, one 1152-wide KV block per (b, h) cell). At 32
layers that fixed cost is ~2 ms of a 14.7 ms step. This sweeps the
block geometry at exactly that shape to see whether smaller blocks
(less tail waste past the 1024 fill, more grid parallelism) or forced
splits buy anything, and records the answer either way.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/decode_block_sweep.py
"""

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.ops.quantized import (
    QuantizedKV,
    flash_attention_decode_quantized,
)
from flash_attention_cute_tpu.utils.timing import time_chained

L, B, HQ, HKV, D = 8, 8, 32, 8, 128
CAP, FILL = 1152, 1024


def main():
    ks = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(ks[0], (B, HQ, 1, D), jnp.float32).astype(
        jnp.bfloat16)
    kv = jax.random.randint(ks[1], (L, B, HKV, CAP, D), -127, 128
                            ).astype(jnp.int8)
    vs = jax.random.uniform(ks[2], (L, B, HKV, CAP), jnp.float32,
                            0.01, 0.1)
    lengths = jnp.full((B,), FILL, jnp.int32)
    bytes_read = L * (2 * B * HKV * FILL * (D + 4))

    for rep in range(2):
        for block_kv in (2048, 1152, 512, 384, 256):
            for splits in (0, 2) if block_kv <= 512 else (0,):
                def chain(n):
                    @jax.jit
                    def f(q, kv, vs, lengths):
                        def body(i, q_):
                            outs = []
                            for l in range(L):
                                o = flash_attention_decode_quantized(
                                    q_, QuantizedKV(kv, vs),
                                    QuantizedKV(kv, vs),
                                    kv_length=lengths,
                                    layer=jnp.int32(l),
                                    block_kv=block_kv,
                                    num_splits=splits,
                                )
                                outs.append(o)
                            o = sum(outs) / L
                            return (q_ * 0.5 + o * 0.5).astype(q_.dtype)

                        out = jax.lax.fori_loop(0, n, body, q)
                        return out[0, 0, 0, 0].astype(jnp.float32)

                    return f

                t = time_chained(chain, (q, kv, vs, lengths), n1=4, n2=20)
                per_layer = t / L * 1e6
                print(f"[rep {rep}] block_kv={block_kv:5d} splits={splits} "
                      f" {per_layer:7.1f} us/layer "
                      f"{bytes_read/t/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
