"""Round-3 sweep: production diag-first kernel tuning (fused_subs, inner).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/experiment_diag3.py
"""
import functools
import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd
from flash_attention_cute_tpu.ops.reference import attention_reference
from flash_attention_cute_tpu.utils.timing import chain_attention, time_chained

PEAK = 197e12


def main():
    B, HQ, HKV, S, D = 16, 64, 8, 1024, 128
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    fl = 4 * B * HQ * S * S * D * 0.5

    configs = [
        ("i4_f2_prod", dict()),
        ("i4_f3", dict(inner_splits=4, diag_fused_subs=3)),
        ("i8_f4", dict(inner_splits=8, diag_fused_subs=4)),
        ("i4_f2_again", dict()),
        ("i2_f1", dict(inner_splits=2, diag_fused_subs=1)),
    ]
    for name, kw in configs:
        fn = functools.partial(flash_attention_fwd, causal=True, **kw)
        try:
            o = fn(q, k, v)
            r = attention_reference(q, k, v, causal=True)
            err = float(jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32)).max())
            t = time_chained(
                functools.partial(chain_attention, fn, out_dtype=q.dtype),
                (q, k, v), n1=10, n2=50,
            )
            tf = fl / t / 1e12
            print(f"{name:14s} {t*1e3:7.3f} ms {tf:7.1f} TF/s "
                  f"({tf/PEAK*1e12*100:4.1f}%) err={err:.2e}", flush=True)
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
