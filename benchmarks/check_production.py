"""Post-integration hardware check of the production fused kernel.

Measures the headline config + non-causal raw + long-S causal through the
PRODUCTION flash_attention_fwd (lazy max + static mask policy), verifying
numerics vs the fp32 oracle each time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/check_production.py
"""

import functools

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd
from flash_attention_cute_tpu.ops.reference import attention_reference
from flash_attention_cute_tpu.utils.timing import chain_attention, time_chained

PEAK = 197e12


def bench(label, q, k, v, causal, tol=3.5e-2, **kw):
    fn = functools.partial(flash_attention_fwd, causal=causal, **kw)
    o = fn(q, k, v)
    r = attention_reference(q, k, v, causal=causal)
    err = float(jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32)).max())
    assert err < tol, (label, err)
    t = time_chained(
        functools.partial(chain_attention, fn, out_dtype=q.dtype),
        (q, k, v), n1=10, n2=50,
    )
    b, hq, s, d = q.shape
    skv = k.shape[2]
    fl = 4 * b * hq * s * skv * d * (0.5 if causal else 1.0)
    tf = fl / t / 1e12
    print(f"{label:44s} {t*1e3:8.3f} ms {tf:7.1f} TF/s "
          f"({tf/PEAK*1e12*100:4.1f}%) err={err:.1e}", flush=True)


def mk(b, hq, hkv, s, d, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(ks[0], (b, hq, s, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    return q, k, v


def main():
    q, k, v = mk(16, 64, 8, 1024, 128)
    bench("headline causal defaults", q, k, v, True)
    bench("headline causal bq512 bkv512 i4", q, k, v, True,
          block_q=512, block_kv=512, inner_splits=4)
    bench("headline non-causal defaults", q, k, v, False)
    bench("headline non-causal bq512 bkv1024 i8", q, k, v, False,
          block_q=512, block_kv=1024, inner_splits=8)
    bench("headline non-causal bq512 bkv512 i4", q, k, v, False,
          block_q=512, block_kv=512, inner_splits=4)

    # Long-S: verify on a B=1 slice (the full-batch fp32 oracle scores
    # tensor would exhaust HBM), then time the full batch.
    q, k, v = mk(4, 32, 8, 4096, 128, seed=1)
    o = flash_attention_fwd(q[:1, :8], k[:1, :2], v[:1, :2], causal=True)
    r = attention_reference(q[:1, :8], k[:1, :2], v[:1, :2], causal=True)
    err = float(jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32)).max())
    assert err < 3.5e-2, err
    fn = functools.partial(flash_attention_fwd, causal=True)
    t = time_chained(
        functools.partial(chain_attention, fn, out_dtype=q.dtype),
        (q, k, v), n1=10, n2=50,
    )
    fl = 4 * 4 * 32 * 4096 * 4096 * 128 * 0.5
    print(f"{'llama3-8b prefill S4096 causal defaults':44s} "
          f"{t*1e3:8.3f} ms {fl/t/1e12:7.1f} TF/s "
          f"({fl/t/PEAK*100:4.1f}%) err={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
