"""Hardware verification of round-2 additions (run on the real TPU).

Drives, at the public API surface on the TPU backend:
  1. quantized paged-extend kernel vs dequant oracle (page_size=128)
  2. Pallas backward (dq/dk/dv) vs the XLA analytic gradient
  3. masked paged scatter: inactive slots must not touch live pages
  4. varlen with unequal q/kv lengths (band removed)

Usage: python scripts/verify_r2_hw.py
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def check(name, got, want, tol):
    err = float(
        jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
    )
    status = "OK" if err <= tol else "FAIL"
    print(f"{name}: max err {err:.3e} (tol {tol:g}) {status}")
    assert err <= tol, (name, err, tol)


def main():
    print("backend:", jax.default_backend(), jax.devices())
    assert jax.default_backend() == "tpu", "tunnel down — BLOCKED"

    from flash_attention_cute_tpu.ops.quantized import (
        QuantizedKV,
        paged_attention_extend_quantized,
        quantize_kv,
    )
    from flash_attention_cute_tpu.ops.reference import attention_reference

    # ---- 1. quantized paged extend, page_size=128 (hardware lane rule) ----
    b, hq, hkv, sq, pps, ps, d = 2, 8, 2, 64, 4, 128, 128
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, sq, d), jnp.float32).astype(jnp.bfloat16)
    num_pages = b * pps + 1
    kd = jax.random.normal(kk, (hkv, num_pages, ps, d), jnp.float32)
    vd = jax.random.normal(kv, (hkv, num_pages, ps, d), jnp.float32)
    kqz, vqz = quantize_kv(kd, jnp.int8), quantize_kv(vd, jnp.int8)
    tbl = jnp.arange(1, b * pps + 1, dtype=jnp.int32).reshape(b, pps)
    q_off = jnp.array([100, 0], jnp.int32)
    kv_len = q_off + sq

    out = paged_attention_extend_quantized(
        q, kqz, vqz, q_off, kv_len, tbl, pages_per_compute_block=2
    )
    # interpret-mode cross-check (logic) + dequant oracle (numerics)
    out_i = paged_attention_extend_quantized(
        q, kqz, vqz, q_off, kv_len, tbl, pages_per_compute_block=2,
        interpret=True,
    )
    check("quant-extend hw-vs-interpret", out, out_i, 2e-2)

    def gather(qz):
        dense = qz.values.astype(jnp.float32) * qz.scales[..., None]
        flat = dense.reshape(hkv, num_pages * ps, d)
        idx = (tbl * ps)[:, :, None] + jnp.arange(ps)[None, None, :]
        return jax.vmap(lambda f: flat[:, f])(idx.reshape(b, -1))

    ref = attention_reference(
        q.astype(jnp.float32), gather(kqz), gather(vqz), causal=True,
        kv_length=kv_len, q_offset=q_off,
    )
    check("quant-extend vs dequant oracle", out, ref, 3e-2)

    # ---- 2. Pallas backward on hardware vs XLA analytic grads ----
    from flash_attention_cute_tpu.ops import autodiff
    from flash_attention_cute_tpu.ops.flash_bwd import flash_attention_bwd
    from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd

    b2, hq2, hkv2, s2, d2 = 2, 8, 2, 1024, 128
    kq, kk, kv, kg = jax.random.split(jax.random.key(1), 4)
    qf = jax.random.normal(kq, (b2, hq2, s2, d2), jnp.float32)
    kf = jax.random.normal(kk, (b2, hkv2, s2, d2), jnp.float32)
    vf = jax.random.normal(kv, (b2, hkv2, s2, d2), jnp.float32)
    g = jax.random.normal(kg, (b2, hq2, s2, d2), jnp.float32)

    out, lse = flash_attention_fwd(qf, kf, vf, causal=True, return_lse=True)
    dq, dk, dv = flash_attention_bwd(
        qf, kf, vf, out, g, lse, causal=True
    )
    dq2, dk2, dv2 = autodiff._bwd(
        None, True, None, None, (qf, kf, vf, None, None), g
    )
    # f32 on TPU matmul = bf16 passes; grads accumulate over S -> scale tol
    # by the grad magnitude.
    for name, a, bb in (("dq", dq, dq2), ("dk", dk, dk2), ("dv", dv, dv2)):
        scale = float(jnp.max(jnp.abs(bb))) or 1.0
        err = float(jnp.max(jnp.abs(a - bb))) / scale
        status = "OK" if err <= 2e-2 else "FAIL"
        print(f"pallas-bwd {name}: rel err {err:.3e} {status}")
        assert err <= 2e-2, (name, err)

    # bf16 grads end-to-end through jax.grad
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (qf, kf, vf))

    def loss(q_, k_, v_):
        return jnp.sum(
            autodiff.flash_attention(q_, k_, v_, None, True, None).astype(
                jnp.float32
            )
            ** 2
        )

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb)
    for name, arr in (("gq", gq), ("gk", gk), ("gv", gv)):
        assert bool(jnp.all(jnp.isfinite(arr.astype(jnp.float32)))), name
    print("pallas-bwd bf16 jax.grad: finite OK")

    # ---- 3. masked scatter: inactive slot leaves pages untouched ----
    from flash_attention_cute_tpu.runtime.paged_cache import (
        paged_append_layer,
    )

    hkv3, p3, ps3, d3 = 2, 5, 128, 128
    kpages = jnp.zeros((hkv3, p3, ps3, d3), jnp.bfloat16)
    vpages = jnp.zeros_like(kpages)
    sentinel = jnp.full((hkv3, p3, ps3, d3), 7.0, jnp.bfloat16)
    table = jnp.array([[1, 2], [3, 4]], jnp.int32)
    lengths = jnp.array([0, 0], jnp.int32)  # slot 0 mid-admission
    knew = jnp.ones((2, hkv3, 1, d3), jnp.bfloat16)
    active = jnp.array([False, True])
    k2, v2 = paged_append_layer(
        sentinel, sentinel, knew, knew, table, lengths, active
    )
    assert float(jnp.max(jnp.abs(k2[:, 1] - 7.0))) == 0.0, (
        "inactive slot scatter leaked into page 1"
    )
    assert float(k2[0, 3, 0, 0]) == 1.0, "active slot scatter missing"
    print("masked scatter: inactive slot pages untouched OK")

    # ---- 4. varlen with unequal q/kv lengths on hardware ----
    from flash_attention_cute_tpu.ops.flash_varlen import (
        flash_attention_varlen,
    )

    lens_q = [16] * 8
    lens_kv = [256] * 8
    tq, tkv = sum(lens_q), sum(lens_kv)
    kq, kk, kv = jax.random.split(jax.random.key(2), 3)
    qv = jax.random.normal(kq, (tq, 4, 128), jnp.float32)
    kvk = jax.random.normal(kk, (tkv, 2, 128), jnp.float32)
    kvv = jax.random.normal(kv, (tkv, 2, 128), jnp.float32)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(lens_q)]), jnp.int32)
    cu_kv = jnp.asarray(np.concatenate([[0], np.cumsum(lens_kv)]), jnp.int32)
    out = flash_attention_varlen(
        qv, kvk, kvv, cu_q, cu_seqlens_kv=cu_kv, causal=True,
        max_seqlen=256, block_q=128, block_kv=128,
    )
    outs = []
    for i in range(8):
        o = attention_reference(
            jnp.swapaxes(qv[cu_q[i]:cu_q[i + 1]], 0, 1)[None],
            jnp.swapaxes(kvk[cu_kv[i]:cu_kv[i + 1]], 0, 1)[None],
            jnp.swapaxes(kvv[cu_kv[i]:cu_kv[i + 1]], 0, 1)[None],
            causal=True,
        )
        outs.append(jnp.swapaxes(o[0], 0, 1))
    check("varlen unequal-lengths hw", out, jnp.concatenate(outs), 1e-2)

    print("R2 HARDWARE VERIFY OK")


if __name__ == "__main__":
    main()
