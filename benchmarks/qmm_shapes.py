"""Per-shape quantized-matmul rates at the in-model decode shapes.

layer_overhead.py measured the four fused projections at 428 us/layer
vs a 192 us weight-stream floor (int4, B8): the qmm path runs at ~45%
of its swept rate IN THE MODEL while the 4096x4096 sweep showed 575
GB/s. This bench times each projection shape in isolation (T=8 decode
activations) to find where the loss is: a specific (K, N) geometry, or
the composition (inter-kernel gaps, reshapes) that the per-shape sum
would then rule out.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/qmm_shapes.py [--bits 4] [--t 8]
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.ops.quantized_matmul import (
    quantize_weight,
    quantize_weight_int4,
    quantized_matmul,
)
from flash_attention_cute_tpu.utils.timing import time_chained

# Llama-3-8B fused projection shapes.
SHAPES = {
    "qkv":     (4096, 6144),
    "o":       (4096, 4096),
    "gate_up": (4096, 57344),
    "down":    (14336, 4096),
    "square":  (4096, 4096),   # the sweep's reference shape
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bits", type=int, choices=[8, 4], default=4)
    p.add_argument("--t", type=int, default=8)
    a = p.parse_args()
    qf = quantize_weight if a.bits == 8 else quantize_weight_int4
    per_el = 1.0 if a.bits == 8 else 0.5

    results = {}
    for rep in range(2):
        for name, (k, n) in SHAPES.items():
            w = jax.random.normal(
                jax.random.key(1), (k, n), jnp.float32) * k ** -0.5
            qw = jax.jit(qf)(w)
            x = jax.random.normal(
                jax.random.key(2), (a.t, k), jnp.float32
            ).astype(jnp.bfloat16)

            def chain(nn):
                @jax.jit
                def f(x, qw):
                    def body(i, x_):
                        o = quantized_matmul(x_, qw)
                        # Feed back through a slice so shapes close and
                        # values stay bounded.
                        return (x_ + o[:, :1] * 1e-6).astype(x_.dtype)

                    out = jax.lax.fori_loop(0, nn, body, x)
                    return out[0, 0].astype(jnp.float32)

                return f

            t_it = time_chained(chain, (x, qw), n1=10, n2=50)
            wbytes = k * n * per_el + (
                qw.scales.size * 4 if a.bits == 4 else n * 4)
            gbs = wbytes / t_it / 1e9
            key = name
            best = results.get(key)
            if best is None or t_it < best[0]:
                results[key] = (t_it, gbs)
            print(f"[rep {rep}] {name:8s} K={k:6d} N={n:6d}  "
                  f"{t_it*1e6:8.1f} us  {gbs:6.1f} GB/s")

    tot = sum(v[0] for nm, v in results.items() if nm != "square")
    print(f"\nsum of 4 projections: {tot*1e6:.1f} us "
          f"(layer_overhead mm_only measured ~428 us incl. reshapes)")


if __name__ == "__main__":
    main()
