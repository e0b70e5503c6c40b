"""Round-5 hardware verification (real TPU, not interpret mode).

Covers the round-5 hot-path changes, per the verify skill's drive
pattern (hardware vs interpret must agree ~1e-6 on identical inputs;
kernel vs dequant oracle within the documented quantization envelope):

  1. Stacked-cache quantized decode (layer scalar-prefetch) — the new
     full-depth int8-KV decode path: hardware vs interpret, stacked vs
     host-sliced, and vs the fp32 reference over the dequantized slab.
  2. Model-level: greedy generation with an int8-KV cache must be
     token-identical to the bf16-cache generation being approximated
     only where quantization noise can't flip near-ties — so instead we
     assert the stacked path equals the pre-round-5 sliced path exactly
     (same quantized representation, same math, different indexing).

Run: python scripts/verify_r5_hw.py
Dry-run the flow on CPU (interpret-vs-interpret, checks plumbing only):
     python scripts/verify_r5_hw.py --interpret
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_cute_tpu.ops.quantized import (
    QuantizedKV,
    dequantize_kv,
    flash_attention_decode_quantized,
    quantize_kv,
)
from flash_attention_cute_tpu.ops.reference import attention_reference

FAILURES = []


def check(name, err, tol):
    ok = err <= tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: err={err:.3e} tol={tol:.1e}")
    if not ok:
        FAILURES.append(name)


def main():
    dry = "--interpret" in sys.argv[1:]
    hw = dict(interpret=True) if dry else {}
    if dry:
        # The env var alone is overridden by the axon plugin (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")
    devs = jax.devices()
    print("devices:", devs)
    if not dry:
        assert devs[0].platform == "tpu", "tunnel down — BLOCKED"

    key = jax.random.key(7)
    nl, b, hq, hkv, d = 4, 8, 32, 8, 128
    skv = 1152  # ragged vs block_kv=2048 -> exercises the clamped tail
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, hq, 1, d), jnp.float32).astype(jnp.bfloat16)
    kk = jax.random.normal(ks[1], (nl, b, hkv, skv, d), jnp.float32)
    vv = jax.random.normal(ks[2], (nl, b, hkv, skv, d), jnp.float32)
    kq, vq = quantize_kv(kk), quantize_kv(vv)
    lens = jnp.asarray(
        np.random.default_rng(0).integers(16, skv + 1, size=b), jnp.int32
    )

    for layer in (0, nl - 1):
        lay = jnp.int32(layer)
        hw_o = flash_attention_decode_quantized(
            q, kq, vq, kv_length=lens, layer=lay, **hw
        )
        interp = flash_attention_decode_quantized(
            q, kq, vq, kv_length=lens, layer=lay, interpret=True
        )
        err = float(jnp.abs(hw_o.astype(jnp.float32)
                            - interp.astype(jnp.float32)).max())
        check(f"stacked quant decode hw-vs-interpret (layer {layer})",
              err, 2e-3)

        sliced = flash_attention_decode_quantized(
            q,
            QuantizedKV(values=kq.values[layer], scales=kq.scales[layer]),
            QuantizedKV(values=vq.values[layer], scales=vq.scales[layer]),
            kv_length=lens, **hw,
        )
        err = float(jnp.abs(hw_o.astype(jnp.float32)
                            - sliced.astype(jnp.float32)).max())
        check(f"stacked-vs-sliced on hardware (layer {layer})", err, 2e-3)

        ref = attention_reference(
            q,
            dequantize_kv(QuantizedKV(kq.values[layer], kq.scales[layer]),
                          jnp.bfloat16),
            dequantize_kv(QuantizedKV(vq.values[layer], vq.scales[layer]),
                          jnp.bfloat16),
            kv_length=lens,
        )
        err = float(jnp.abs(hw_o.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        check(f"stacked quant decode vs dequant oracle (layer {layer})",
              err, 3e-2)

    # Model-level: full decode loop through the stacked path (tiny model,
    # greedy) must match the interpret-mode run token for token.
    from flash_attention_cute_tpu.models.config import tiny_test_config
    from flash_attention_cute_tpu.models.transformer import init_params
    from flash_attention_cute_tpu.runtime.generate import greedy_generate

    # head_dim=128 keeps the stacked cache un-padded on the lane axis
    # (padding a stacked cache copies all layers — the script verifies the
    # production geometry, not the pad path).
    cfg = tiny_test_config(num_layers=3, head_dim=128)
    params = init_params(cfg, jax.random.key(0))
    ids = jax.random.randint(jax.random.key(1), (2, 33), 0, cfg.vocab_size)
    hw_toks = np.asarray(greedy_generate(
        params, cfg, ids, 17, cache_capacity=96, cache_dtype=jnp.int8, **hw
    ))
    cpu_toks = np.asarray(greedy_generate(
        params, cfg, ids, 17, cache_capacity=96, cache_dtype=jnp.int8,
        interpret=True,
    ))
    same = (hw_toks == cpu_toks).mean()
    print(f"{'PASS' if same >= 0.9 else 'FAIL'} int8-KV greedy generate "
          f"hw-vs-interpret token agreement: {same:.3f}")
    if same < 0.9:
        FAILURES.append("generate agreement")

    print("ALL PASS" if not FAILURES else f"FAILURES: {FAILURES}")
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
