"""Measure the MXU/VPU-overlap kernel variants on the real chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/experiment_overlap.py
Prints TFLOP/s per (variant, config); verifies each variant vs the fp32
oracle before timing (hardware-only block-geometry bugs — see CLAUDE.md).
"""

import functools
import sys

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd
from flash_attention_cute_tpu.ops.reference import attention_reference
from flash_attention_cute_tpu.utils.timing import chain_attention, time_chained
from benchmarks.flash_variants import flash_fwd_variant

PEAK = 197e12


def flops(b, hq, sq, skv, d, causal):
    f = 4 * b * hq * sq * skv * d
    return f // 2 if causal else f


def bench(fn, q, k, v, causal, label, check=True):
    if check:
        o = fn(q, k, v)
        r = attention_reference(q, k, v, causal=causal)
        err = float(
            jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32)).max()
        )
        assert err < 3e-2, (label, err)
    t = time_chained(
        functools.partial(chain_attention, fn, out_dtype=q.dtype),
        (q, k, v), n1=10, n2=50,
    )
    b, hq, sq, d = q.shape
    skv = k.shape[2]
    tf = flops(b, hq, sq, skv, d, causal) / t / 1e12
    print(f"{label:58s} {t*1e3:8.3f} ms  {tf:7.1f} TF/s ({tf/PEAK*1e12*100:4.1f}%)")
    return tf


def main():
    print("backend:", jax.devices())
    B, HQ, HKV, S, D = 16, 64, 8, 1024, 128
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)

    which = sys.argv[1:] or ["base", "multiacc", "twophase"]

    for causal in (False, True):
        tag = "causal" if causal else "full  "
        if "base" in which:
            bench(
                functools.partial(flash_attention_fwd, causal=causal),
                q, k, v, causal, f"{tag} base (current defaults)",
            )
        for variant in ("multiacc", "twophase"):
            if variant not in which:
                continue
            for bq, bkv, inner in ((256, 512, 4), (512, 512, 4),
                                   (256, 1024, 8), (512, 1024, 8)):
                if variant == "twophase" and bkv * (HQ // HKV) * bq * 4 > 9 * 2**20:
                    continue  # s_scratch too large for VMEM
                try:
                    bench(
                        functools.partial(
                            flash_fwd_variant, variant=variant,
                            causal=causal, block_q=bq, block_kv=bkv,
                            inner=inner,
                        ),
                        q, k, v, causal,
                        f"{tag} {variant} bq={bq} bkv={bkv} inner={inner}",
                    )
                except Exception as e:
                    print(f"{tag} {variant} bq={bq} bkv={bkv} inner={inner}"
                          f" FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
