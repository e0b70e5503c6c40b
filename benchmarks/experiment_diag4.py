"""Round-3 sweep #4: headline config tuning for the diag-first kernel.

Key idea under test: at S=1024 a block of 1024 makes nq = nkv = 1, so the
ENTIRE computation is one diagonal step per (b, h) — no dead grid steps,
no interior/diag branch duality, and the per-head suffix slicing covers
the whole triangle (computed fraction ~0.59 of dense at inner=8/fused=2
vs 0.69 for the 512-block two-tile walk).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/experiment_diag4.py
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
        ("prod_i4_f2", dict()),
        ("b1024_i8_f2", dict(block_q=1024, block_kv=1024, inner_splits=8,
                             diag_fused_subs=2)),
        ("b1024_i8_f3", dict(block_q=1024, block_kv=1024, inner_splits=8,
                             diag_fused_subs=3)),
        ("prod_again", dict()),
        ("b1024_i4_f1", dict(block_q=1024, block_kv=1024, inner_splits=4,
                             diag_fused_subs=1)),
        ("b256_i2_f1", dict(block_q=256, block_kv=256, inner_splits=2,
                            diag_fused_subs=1)),
    ]
    for rep in range(2):
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
                print(f"[{rep}] {name:14s} {t*1e3:7.3f} ms {tf:7.1f} TF/s "
                      f"({tf/PEAK*1e12*100:4.1f}%) err={err:.2e}", flush=True)
            except Exception as e:
                print(f"[{rep}] {name}: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
