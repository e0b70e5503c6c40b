"""Round-5c hardware verification (real TPU).

Covers this session's product changes, per the verify skill's drive
pattern (hardware vs interpret on identical inputs; quantize paths vs
bit-exact oracles):

  1. `lax.map` layer-chunked weight quantization (the OOM fix for
     device-side quantize of fused full-width pytrees): stacked int8 and
     int4 quantize on DEVICE must produce bit-identical integer values
     to per-layer host quantize (scales within a few ULP — reduction
     order differs under the map).
  2. `_kv_write` per-row dynamic_update_slice cache append (replacing
     the advanced-index scatter in models/transformer.py): greedy decode
     and an extend-mode chunk through `forward` must be token/logit
     identical between hardware and interpret, for BOTH the bf16 stacked
     cache and the int8 quantized cache, at an odd batch (3) and ragged
     capacity.

Run: python scripts/verify_r5c_hw.py
CPU plumbing check: python scripts/verify_r5c_hw.py --interpret
"""

import dataclasses
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

FAILURES = []


def check(name, err, tol):
    ok = err <= tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: err={err:.3e} tol={tol:.1e}")
    if not ok:
        FAILURES.append(name)


def check_true(name, cond, detail=""):
    print(f"{'PASS' if cond else 'FAIL'} {name} {detail}")
    if not cond:
        FAILURES.append(name)


def main():
    dry = "--interpret" in sys.argv[1:]
    if dry:
        jax.config.update("jax_platforms", "cpu")
    devs = jax.devices()
    print("devices:", devs)
    if not dry:
        assert devs[0].platform == "tpu", "tunnel down — BLOCKED"

    from flash_attention_cute_tpu.models import forward, init_params
    from flash_attention_cute_tpu.models.cache import (
        KVCache, QuantizedKVCache,
    )
    from flash_attention_cute_tpu.models.config import ModelConfig
    from flash_attention_cute_tpu.models.fuse import fuse_projections
    from flash_attention_cute_tpu.models.quantize import quantize_params
    from flash_attention_cute_tpu.ops.quantized_matmul import (
        quantize_weight, quantize_weight_int4,
    )

    # --- 1. lax.map stacked quantize vs per-layer host oracle ---
    w = np.random.default_rng(0).standard_normal((3, 256, 384)).astype(
        np.float32)
    wj = jnp.asarray(w)
    for bits, qf in ((8, quantize_weight), (4, quantize_weight_int4)):
        dev = jax.block_until_ready(jax.jit(qf)(wj))
        per = [qf(wj[i]) for i in range(3)]
        vals_ok = all(
            np.array_equal(np.asarray(dev.values[i]),
                           np.asarray(per[i].values))
            for i in range(3))
        sdiff = max(
            float(np.abs(np.asarray(dev.scales[i], np.float64)
                         - np.asarray(per[i].scales, np.float64)).max())
            for i in range(3))
        check_true(f"lax.map int{bits} stacked quantize values bit-exact",
                   vals_ok)
        check(f"lax.map int{bits} stacked quantize scales", sdiff, 1e-6)

    # --- 2. _kv_write decode/extend: hardware vs interpret ---
    cfg = ModelConfig(
        vocab_size=512, hidden_size=512, intermediate_size=1024,
        num_layers=4, num_q_heads=8, num_kv_heads=2, head_dim=128,
        max_position_embeddings=512, dtype=jnp.bfloat16)
    params = fuse_projections(init_params(cfg, jax.random.key(0)))
    qparams = jax.jit(functools.partial(quantize_params, bits=8))(params)

    B, plen, cap = 3, 37, 96  # odd batch, ragged lengths/capacity
    ids = jax.random.randint(jax.random.key(1), (B, plen), 0,
                             cfg.vocab_size).astype(jnp.int32)

    def drive(p, cache, interpret):
        logits, cache = forward(p, cfg, ids, cache=cache, mode="prefill",
                                interpret=interpret)
        cache = dataclasses.replace(
            cache, lengths=jnp.full((B,), plen, jnp.int32))
        toks = []
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        for _ in range(6):
            toks.append(tok)
            logits, cache = forward(p, cfg, tok, cache=cache,
                                    mode="decode", interpret=interpret)
            tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        # extend-mode chunk (s=4) through the same _kv_write path
        chunk = jax.random.randint(jax.random.key(2), (B, 4), 0,
                                   cfg.vocab_size).astype(jnp.int32)
        elog, cache = forward(p, cfg, chunk, cache=cache, mode="extend",
                              interpret=interpret)
        return (jnp.concatenate(toks, axis=1),
                elog.astype(jnp.float32), cache)

    for label, p, mk in (
        ("bf16 cache", params,
         lambda: KVCache.create(cfg, batch=B, capacity=cap)),
        ("int8 cache", qparams,
         lambda: QuantizedKVCache.create(cfg, batch=B, capacity=cap)),
    ):
        t_hw, el_hw, c_hw = drive(p, mk(), interpret=None if not dry
                                  else True)
        t_ip, el_ip, c_ip = drive(p, mk(), interpret=True)
        same = float(jnp.mean((t_hw == t_ip).astype(jnp.float32)))
        check_true(f"_kv_write decode tokens hw-vs-interpret [{label}]",
                   same >= (0.95 if not dry else 1.0),
                   f"agreement={same:.3f}")
        ediff = float(jnp.abs(el_hw - el_ip).max())
        # bf16 model logits; hw-vs-interpret ULP scale per CLAUDE.md
        check(f"extend logits hw-vs-interpret [{label}]", ediff, 3e-2)
        # Cache contents at the written rows must match exactly in the
        # quantized representation (same integers) / to bf16 rounding.
        k_hw = jax.tree.leaves(c_hw)[0]
        k_ip = jax.tree.leaves(c_ip)[0]
        kdiff = float(jnp.abs(
            k_hw.astype(jnp.float32) - k_ip.astype(jnp.float32)).max())
        check(f"cache rows hw-vs-interpret [{label}]", kdiff,
              0.1 if label.startswith("int8") else 3e-2)

    print("ALL PASS" if not FAILURES else f"FAILURES: {FAILURES}")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
