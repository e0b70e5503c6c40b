"""head_dim 128<D<=256: padded-to-256 lanes vs native-D lanes.

Round-1 verdict #7: D in (128, 256] pads to 256 lanes — up to 2x wasted
HBM traffic and MXU passes for e.g. D=192 models. This measures the
native-lane layout (pad only to a sublane multiple) against the padded
one on real hardware.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/experiment_d192.py
"""

import functools

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.ops.reference import attention_reference
from flash_attention_cute_tpu.utils.timing import chain_attention, time_chained
from benchmarks.flash_variants import flash_fwd_variant

PEAK = 197e12


def main():
    for D in (192, 256):
        B, HQ, HKV, S = 4, 16, 4, 2048
        ks = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)

        for causal in (False, True):
            fl = 4 * B * HQ * S * S * D * (0.5 if causal else 1.0)
            for pad_d in (True, False):
                if D == 256 and not pad_d:
                    continue
                fn = functools.partial(
                    flash_fwd_variant, variant="probe", mode="lazymax",
                    causal=causal, block_q=512, block_kv=512, inner=4,
                    pad_d=pad_d,
                )
                try:
                    o = fn(q, k, v)
                    r = attention_reference(q, k, v, causal=causal)
                    err = float(jnp.abs(o.astype(jnp.float32)
                                        - r.astype(jnp.float32)).max())
                    t = time_chained(
                        functools.partial(chain_attention, fn,
                                          out_dtype=q.dtype),
                        (q, k, v), n1=10, n2=50,
                    )
                    tf = fl / t / 1e12
                    print(f"D={D} causal={int(causal)} pad_d={int(pad_d)} "
                          f"{t*1e3:7.3f} ms {tf:7.1f} TF/s "
                          f"({tf/PEAK*1e12*100:4.1f}%) err={err:.2e}",
                          flush=True)
                except Exception as e:
                    print(f"D={D} causal={int(causal)} pad_d={int(pad_d)} "
                          f"{type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
