"""Attribute model-level decode time against the weights-streaming floor.

Round-1 verdict #8: decode sat at ~85% of its weights-streaming floor with
no profile taken. Rather than a trace (xplane capture is unreliable over
the axon tunnel), this measures the decode step at several KV-cache fill
levels and batch sizes: the fill-level slope isolates the KV-cache read
cost, the extrapolation to fill=0 isolates the weights+overhead term, and
comparing against exact byte counts attributes the gap.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/decode_attribution.py
"""

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.models import forward, init_params
from flash_attention_cute_tpu.models.cache import KVCache
from flash_attention_cute_tpu.models.llama import llama3_8b_config
from flash_attention_cute_tpu.utils.timing import time_chained

HBM_GBs = 819e9


def main():
    layers = 8
    cfg = dataclasses.replace(llama3_8b_config(), num_layers=layers)
    params = init_params(cfg, jax.random.key(0))

    pbytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
    print(f"params: {pbytes/2**30:.2f} GiB ({layers} layers, 8B width)")

    def decode_chain(n):
        @jax.jit
        def f(params, tok, cache):
            def body(i, carry):
                tok, cache = carry
                logits, cache = forward(
                    params, cfg, tok, cache=cache, mode="decode"
                )
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return (nxt, cache)

            tok, cache = jax.lax.fori_loop(0, n, body, (tok, cache))
            return tok[0, 0].astype(jnp.float32)

        return f

    B = 8
    import sys

    tight = "--tight" in sys.argv
    for fill in (16, 1024, 4096):
        cap = fill + 64 if tight else max(4096 + 64, fill + 64)
        cache = KVCache.create(cfg, batch=B, capacity=cap)
        # Pretend the cache is filled to `fill` (contents are zeros; decode
        # reads exactly `fill` tokens' K/V per layer either way).
        cache = dataclasses.replace(
            cache, lengths=jnp.full((B,), fill, jnp.int32)
        )
        tok = jnp.ones((B, 1), jnp.int32)
        t = time_chained(decode_chain, (params, tok, cache), n1=4, n2=20)
        kv_bytes = (
            2 * layers * cfg.num_kv_heads * cfg.head_dim * fill * B * 2
        )
        floor = (pbytes + kv_bytes) / HBM_GBs
        print(
            f"B={B} fill={fill:5d}: {t*1e3:7.3f} ms/token   "
            f"floor {floor*1e3:6.3f} ms (weights {pbytes/HBM_GBs*1e3:.3f} + "
            f"kv {kv_bytes/HBM_GBs*1e3:.3f})   "
            f"efficiency {floor/t*100:5.1f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
