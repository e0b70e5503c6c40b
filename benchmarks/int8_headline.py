"""Headline-shape timing for the opt-in int8 QK^T path.

Interleaves three kernels at the headline config (B16 Hq64 Hkv8 S1024
D128 bf16 causal) over repeated rounds (tunnel variance is ±5-10%):
  prod      — production routing (diag-first fast path)
  fused     — general fused kernel, bf16 scores (what int8 upgrades)
  int8      — general fused kernel, score_dtype='int8'

The honest comparison for BASELINE.md is int8 vs fused (same kernel
structure, only the score matmul dtype changes); prod shows whether
int8-on-general beats the bf16 diag-first fast path outright.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/int8_headline.py
"""
from __future__ import annotations

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd
from flash_attention_cute_tpu.ops.reference import attention_reference
from flash_attention_cute_tpu.utils.timing import chain_attention, time_chained

PEAK = 197e12


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    # Defaults = headline shape; round-3b measured int8 NEGATIVE there and
    # queued a retest at S>=4k where the score matmul dominates:
    #   python benchmarks/int8_headline.py [S] [B]   e.g.  4096 4
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    HQ, HKV, D = 64, 8, 128
    print(f"shape: B{B} Hq{HQ} Hkv{HKV} S{S} D{D}", flush=True)
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    fl = 4 * B * HQ * S * S * D / 2  # causal-half pairs

    # The fp32 oracle materializes the S x S score matrix, which at
    # S=4096 B=4 H=64 is ~17 GB (the r4g retest OOMed on exactly this) —
    # check accuracy on one batch row's first KV-head group instead.
    gq = HQ // HKV
    r = attention_reference(q[:1, :gq], k[:1, :1], v[:1, :1], causal=True)

    def make_fn(kw, drop_aux=False):
        if drop_aux:
            # return_clamps routes to the general fused kernel (the
            # counter is off the critical path by design); drop the aux
            # output so the timing chain sees a plain array.
            def fn(q, k, v):
                return flash_attention_fwd(
                    q, k, v, causal=True, return_clamps=True, **kw
                )[0]
            return fn
        return functools.partial(flash_attention_fwd, causal=True, **kw)

    configs = [
        ("prod", make_fn({})),  # diag-first fast path, bf16 scores
        ("fused", make_fn({}, drop_aux=True)),  # general kernel, bf16 scores
        # Round 3b: score_dtype='int8' routes to the DIAG kernel too at
        # default blocks (512x512); sweep its fused_subs knob.
        ("int8_diag", make_fn(dict(score_dtype="int8"))),
        ("int8_diag_f1", make_fn(dict(score_dtype="int8",
                                      diag_fused_subs=1))),
        ("int8_diag_f4", make_fn(dict(score_dtype="int8",
                                      diag_fused_subs=4))),
        # General fused kernel int8 (mismatched blocks force it).
        ("int8_gen_b1024", make_fn(dict(score_dtype="int8", block_kv=1024,
                                        inner_splits=8))),
    ]
    for rep in range(3):
        for name, fn in configs:
            try:
                o = fn(q, k, v)
                err = float(jnp.abs(o[:1, :gq].astype(jnp.float32)
                                    - r.astype(jnp.float32)).max())
                t = time_chained(
                    functools.partial(chain_attention, fn, out_dtype=q.dtype),
                    (q, k, v), n1=10, n2=50,
                )
                tf = fl / t / 1e12
                print(f"[{rep}] {name:8s} {t*1e3:7.3f} ms {tf:6.1f} TF/s "
                      f"({tf/PEAK*1e12*100:4.1f}%) err={err:.2e}",
                      flush=True)
            except Exception as e:
                print(f"[{rep}] {name}: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
