"""Cost decomposition of the fused prefill kernel (probe modes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/experiment_probe.py
"""

import functools

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.ops.reference import attention_reference
from flash_attention_cute_tpu.utils.timing import chain_attention, time_chained
from benchmarks.flash_variants import flash_fwd_variant

PEAK = 197e12


def main():
    import sys

    B, HQ, HKV, S, D = 16, 64, 8, 1024, 128
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)

    causal = "--causal" in sys.argv
    fl = 4 * B * HQ * S * S * D * (0.5 if causal else 1.0)

    configs = [
        (512, 512, 4, "lazy_nocond", True),
        (512, 1024, 8, "lazy_nocond", True),
        (256, 1024, 8, "lazy_nocond", True),
        (256, 512, 4, "lazy_nocond", True),
    ]
    for bq, bkv, inner, mode, subskip in configs:
            fn = functools.partial(
                flash_fwd_variant, variant="probe", causal=causal,
                block_q=bq, block_kv=bkv, inner=inner, mode=mode,
                subskip=subskip,
            )
            try:
                if mode in ("full", "bf16exp", "lazymax", "lazy_nocond",
                            "lazy_where"):
                    o = fn(q, k, v)
                    r = attention_reference(q, k, v, causal=causal)
                    err = float(jnp.abs(o.astype(jnp.float32)
                                        - r.astype(jnp.float32)).max())
                else:
                    err = float("nan")
                t = time_chained(
                    functools.partial(chain_attention, fn, out_dtype=q.dtype),
                    (q, k, v), n1=10, n2=50,
                )
                tf = fl / t / 1e12
                print(
                    f"bq={bq} bkv={bkv} inner={inner} {mode:8s} "
                    f"subskip={int(subskip)} "
                    f"{t*1e3:7.3f} ms {tf:7.1f} TF/s "
                    f"({tf/PEAK*1e12*100:4.1f}%) err={err:.2e}",
                    flush=True,
                )
            except Exception as e:
                print(f"bq={bq} bkv={bkv} inner={inner} {mode}: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
