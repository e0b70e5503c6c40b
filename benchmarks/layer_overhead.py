"""Attribute the per-layer decode overhead at full-model width.

The round-5 full-depth attribution (BASELINE.md) left ~0.26 ms/layer of
decode time unexplained by weight/KV bytes: at 32 layers that overhead
(~8 ms) rivals the entire weight+KV stream. This experiment isolates the
per-layer components with variant ablations of a replica decode layer
(the exact `transformer._layer_forward_carry` math, quantized-cache
branch) scanned over L layers with the hidden state fed back — no
embed/lm-head/sampling in the loop, so the measured time divides by L
into a clean per-layer cost.

Variants (all timed with utils.timing.time_chained):
  full        the production layer: norms+rope, 4 fused qmm matmuls,
              quantize_kv of the new token, 4 advanced-index scatters
              into the stacked cache, stacked-cache decode kernel
  dus         same, but the cache write is B unrolled
              dynamic_update_slice ops per tensor instead of one
              advanced-index scatter (candidate fix: scatter lowers to
              a serialized scatter op on TPU; dus with a dynamic start
              is a plain windowed store)
  no_attn     attention kernel replaced by identity on q
  no_scatter  new token quantized but never written (runtime-guarded
              data dependency so XLA cannot DCE the quantize)
  no_quant    no quantize, no write
  mm_only     only the 4 projection matmuls (no norms/rope/attn/write)

Component attribution:
  attn kernel  = full - no_attn
  cache write  = full - no_scatter
  quantize_kv  = no_scatter - no_quant
  small ops    = no_quant - mm_only - attn  (norms, rope, reshapes)
  matmul floor = mm_only vs exact weight bytes / swept GB/s

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/layer_overhead.py [--layers 8] [--bits 4] [--no-fuse]
    [--interpret]  (CPU shape-check)
"""

from __future__ import annotations

import argparse
import dataclasses
import functools

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.models import init_params
from flash_attention_cute_tpu.models import layers as L
from flash_attention_cute_tpu.models.cache import QuantizedKVCache
from flash_attention_cute_tpu.models.fuse import fuse_projections
from flash_attention_cute_tpu.models.llama import llama3_8b_config
from flash_attention_cute_tpu.models.quantize import quantize_params
from flash_attention_cute_tpu.ops.quantized import (
    QuantizedKV,
    flash_attention_decode_quantized,
    quantize_kv,
)
from flash_attention_cute_tpu.utils.timing import time_chained

VARIANTS = ("full", "dus", "no_attn", "no_scatter", "no_quant", "mm_only")


def replica_layer(x, lp, lidx, ck, ck_s, cv, cv_s, lengths, cos, sin,
                  cfg, variant, interpret):
    """One decode layer, mirroring transformer._layer_forward_carry
    (quantized-cache stacked-kernel branch) with ablation toggles."""
    small = variant != "mm_only"
    h = L.rms_norm(x, lp["input_ln"], cfg.rms_norm_eps) if small else x
    q, k, v = L.qkv_project(h, lp, cfg)
    if small:
        q = L.apply_rope(q, cos, sin)
        k = L.apply_rope(k, cos, sin)

    b, hkv, s, _ = k.shape
    write = variant in ("full", "dus")
    quant = write or variant == "no_scatter"
    kv_len = lengths + s if write else lengths
    if quant:
        nqk = quantize_kv(k, dtype=ck.dtype)
        nqv = quantize_kv(v, dtype=cv.dtype)
    if write:
        if variant == "dus":
            # Per-row windowed stores: B dynamic_update_slice ops per
            # tensor, each with a traced start index — no scatter op.
            for bi in range(b):
                st = lengths[bi]
                ck = jax.lax.dynamic_update_slice(
                    ck, nqk.values[bi][None, None], (lidx, bi, 0, st, 0))
                ck_s = jax.lax.dynamic_update_slice(
                    ck_s, nqk.scales[bi][None, None], (lidx, bi, 0, st))
                cv = jax.lax.dynamic_update_slice(
                    cv, nqv.values[bi][None, None], (lidx, bi, 0, st, 0))
                cv_s = jax.lax.dynamic_update_slice(
                    cv_s, nqv.scales[bi][None, None], (lidx, bi, 0, st))
        else:
            bidx = jnp.arange(b)[:, None, None]
            hidx = jnp.arange(hkv)[None, :, None]
            pos = lengths[:, None, None] + jnp.arange(s)[None, None, :]
            ck = ck.at[lidx, bidx, hidx, pos].set(nqk.values)
            ck_s = ck_s.at[lidx, bidx, hidx, pos].set(nqk.scales)
            cv = cv.at[lidx, bidx, hidx, pos].set(nqv.values)
            cv_s = cv_s.at[lidx, bidx, hidx, pos].set(nqv.scales)
    elif quant:
        # Keep the quantize alive without writing: runtime-false guard.
        dep = jnp.where(lengths[0] < 0,
                        nqk.scales[0, 0, 0] + nqv.scales[0, 0, 0], 0.0)
        x = x + dep.astype(x.dtype)

    if variant in ("full", "dus"):
        attn = flash_attention_decode_quantized(
            q, QuantizedKV(values=ck, scales=ck_s),
            QuantizedKV(values=cv, scales=cv_s),
            kv_length=kv_len, layer=lidx,
            sm_scale=cfg.attention_scale, interpret=interpret)
    elif variant in ("no_scatter", "no_quant"):
        attn = flash_attention_decode_quantized(
            q, QuantizedKV(values=ck, scales=ck_s),
            QuantizedKV(values=cv, scales=cv_s),
            kv_length=kv_len, layer=lidx,
            sm_scale=cfg.attention_scale, interpret=interpret)
    else:  # no_attn, mm_only
        attn = q

    if small:
        x = L.layer_tail(x, attn, lp, cfg)
    else:  # matmuls only: o_proj + mlp with no norms
        h = x + L.attention_output(attn, lp, cfg)
        x = h + L.mlp(h, lp, cfg.hidden_activation)
    return x, ck, ck_s, cv, cv_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--fill", type=int, default=1024)
    p.add_argument("--bits", type=int, choices=[8, 4], default=4)
    p.add_argument("--no-fuse", action="store_true")
    p.add_argument("--interpret", action="store_true",
                   help="tiny-width CPU shape check")
    p.add_argument("--variants", default=",".join(VARIANTS))
    a = p.parse_args()

    cfg = llama3_8b_config()
    if a.interpret:
        cfg = dataclasses.replace(
            cfg, hidden_size=256, intermediate_size=512, num_q_heads=8,
            num_kv_heads=4, head_dim=32, vocab_size=512)
    cfg = dataclasses.replace(cfg, num_layers=a.layers)
    params = init_params(cfg, jax.random.key(0))
    if not a.no_fuse:
        params = fuse_projections(params)
    params = jax.block_until_ready(jax.jit(functools.partial(
        quantize_params, bits=a.bits))(params))
    lp_stacked = params["layers"]
    # The scan body only reads layer weights; drop embed/lm_head.
    del params

    B, fill = a.batch, a.fill
    cap = fill + 64
    cache = QuantizedKVCache.create(cfg, batch=B, capacity=cap)
    cache = dataclasses.replace(cache, lengths=jnp.full((B,), fill,
                                                       jnp.int32))
    key = jax.random.key(1)
    x0 = (jax.random.normal(key, (B, 1, cfg.hidden_size), jnp.float32)
          .astype(cfg.dtype))

    # RoPE tables at the decode positions (computed once per step in
    # production forward(); here once per chain — excluded from the
    # per-layer cost on purpose: it is depth-independent).
    positions = cache.lengths[:, None]
    inv_freq = L.rope_inv_freq(cfg)
    cos, sin = L.rope_cos_sin(positions, inv_freq, cfg.dtype)

    lidxs = jnp.arange(a.layers, dtype=jnp.int32)

    def make_chain(variant):
        layer = functools.partial(
            replica_layer, cfg=cfg, variant=variant,
            interpret=a.interpret)

        def step(x, lp_st, ck, ck_s, cv, cv_s, lengths):
            def body(carry, xs_l):
                x, ck, ck_s, cv, cv_s = carry
                lp, li = xs_l
                x, ck, ck_s, cv, cv_s = layer(
                    x, lp, li, ck, ck_s, cv, cv_s, lengths, cos, sin)
                return (x, ck, ck_s, cv, cv_s), None

            (x, ck, ck_s, cv, cv_s), _ = jax.lax.scan(
                body, (x, ck, ck_s, cv, cv_s), (lp_st, lidxs))
            return x, ck, ck_s, cv, cv_s

        def chain(n):
            @jax.jit
            def f(x, lp_st, ck, ck_s, cv, cv_s, lengths):
                def body(i, carry):
                    x, ck, ck_s, cv, cv_s = carry
                    x, ck, ck_s, cv, cv_s = step(
                        x, lp_st, ck, ck_s, cv, cv_s, lengths)
                    # Renormalize the fed-back hidden state so values
                    # stay bounded through random weights (constant
                    # cost across variants).
                    x = L.rms_norm(x, jnp.ones((cfg.hidden_size,),
                                               cfg.dtype),
                                   cfg.rms_norm_eps)
                    return (x, ck, ck_s, cv, cv_s)

                out = jax.lax.fori_loop(
                    0, n, body, (x, ck, ck_s, cv, cv_s))
                return out[0][0, 0, 0].astype(jnp.float32)

            return f

        return chain

    args = (x0, lp_stacked, cache.k_values, cache.k_scales,
            cache.v_values, cache.v_scales, cache.lengths)

    wbytes = sum(
        v.size * v.dtype.itemsize
        for k in lp_stacked
        for v in jax.tree.leaves(lp_stacked[k])
    ) / a.layers
    kvbytes = 2 * B * cfg.num_kv_heads * fill * (cfg.head_dim + 4)
    print(f"width={cfg.hidden_size} layers={a.layers} batch={B} "
          f"fill={fill} bits={a.bits} fused={not a.no_fuse}")
    print(f"per-layer weight bytes {wbytes/2**20:.1f} MiB, "
          f"KV read {kvbytes/2**20:.1f} MiB")

    results = {}
    todo = [v for v in a.variants.split(",") if v]
    # Interleave variants across repeats (CLAUDE.md timing rule) by
    # running the whole list twice and keeping the min per variant.
    for rep in range(1 if a.interpret else 2):
        for variant in todo:
            t = time_chained(make_chain(variant), args, n1=4, n2=20)
            per_layer = t / a.layers * 1e3
            prev = results.get(variant)
            results[variant] = min(prev, per_layer) if prev else per_layer
            print(f"[rep {rep}] {variant:10s} {t*1e3:7.3f} ms/step  "
                  f"{per_layer*1e3:7.1f} us/layer")

    if all(k in results for k in VARIANTS):
        f, d = results["full"], results["dus"]
        na, ns = results["no_attn"], results["no_scatter"]
        nq, mm = results["no_quant"], results["mm_only"]
        print("\n-- attribution (us/layer) --")
        print(f"matmuls (mm_only)      {mm*1e3:7.1f}")
        print(f"attn kernel            {(f-na)*1e3:7.1f}")
        print(f"cache write (scatter)  {(f-ns)*1e3:7.1f}")
        print(f"cache write (dus)      {(d-ns)*1e3:7.1f}")
        print(f"quantize_kv            {(ns-nq)*1e3:7.1f}")
        print(f"small ops (residual)   {(nq-mm-(f-na))*1e3:7.1f}")
        print(f"TOTAL full             {f*1e3:7.1f}")
        print(f"TOTAL dus              {d*1e3:7.1f}")


if __name__ == "__main__":
    main()
