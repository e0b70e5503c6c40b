"""Differentiable flash attention (custom VJP).

The reference is strictly forward-only — no backward kernel exists
(reference: SURVEY.md §2.2 "forward only (no backward, no dropout...)").
This module goes one step further than parity: `jax.grad` works through
the fused kernel for fine-tuning / RL loops.

Backend routing:
  * TPU (or interpret=True): Pallas forward with the log-sum-exp residual
    (flash_attention_fwd(return_lse=True)) + the Pallas RECOMPUTE backward
    (ops/flash_bwd.py) — FlashAttention-2-style dQ/dK/dV, O(S) memory, no
    S_q x S_kv matrix ever materialized.
  * elsewhere: the analytic XLA gradient below (fp32, materializes one
    S_q x S_kv score tile per (batch, head)) — it doubles as the oracle
    the Pallas backward is tested against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

def _use_pallas(interpret) -> bool:
    from flash_attention_cute_tpu import dispatch

    return dispatch.on_tpu() or bool(interpret)


def _blocks(q, k, causal):
    """The same tuned block config api.flash_attention_forward would
    pick, so the differentiable route is numerically identical to the
    plain one (api routes its dense-prefill calls HERE — this module
    must not call back into api)."""
    from flash_attention_cute_tpu import dispatch

    cfg = dispatch.select_block_config(
        dtype=q.dtype, head_dim=q.shape[-1], q_len=q.shape[2],
        kv_len=k.shape[2], causal=causal,
    )
    return cfg.block_q, cfg.block_kv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: float | None = None,
    causal: bool = False,
    window: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Differentiable attention: Pallas forward + Pallas backward on TPU.

    Layout [B, H, S, D] like `flash_attn_func`; GQA/MQA supported (KV
    gradients sum over the query-head group).
    """
    if _use_pallas(interpret):
        from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd

        bq, bkv = _blocks(q, k, causal)
        return flash_attention_fwd(
            q, k, v, sm_scale=sm_scale, causal=causal, window=window,
            block_q=bq, block_kv=bkv, interpret=bool(interpret),
        )
    from flash_attention_cute_tpu.ops.reference import attention_reference

    return attention_reference(
        q, k, v, softmax_scale=sm_scale, causal=causal, window=window
    )


def _fwd(q, k, v, sm_scale, causal, window, interpret):
    if _use_pallas(interpret):
        from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd

        bq, bkv = _blocks(q, k, causal)
        out, lse = flash_attention_fwd(
            q, k, v, sm_scale=sm_scale, causal=causal, window=window,
            block_q=bq, block_kv=bkv,
            return_lse=True, interpret=bool(interpret),
        )
        return out, (q, k, v, out, lse)
    out = flash_attention(q, k, v, sm_scale, causal, window, interpret)
    return out, (q, k, v, None, None)


def _mask(sq, skv, causal, window):
    rows = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
    offset = skv - sq
    allowed = jnp.ones((sq, skv), jnp.bool_)
    if causal:
        allowed &= cols <= rows + offset
    if window is not None:
        allowed &= cols > rows + offset - window
    return allowed


def _bwd(sm_scale, causal, window, interpret, res, g):
    q, k, v, out, lse = res
    if out is not None:
        from flash_attention_cute_tpu.ops.flash_bwd import (
            flash_attention_bwd,
        )

        return flash_attention_bwd(
            q, k, v, out, g, lse, sm_scale=sm_scale, causal=causal,
            window=window, interpret=bool(interpret),
        )
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    scale = sm_scale if sm_scale is not None else d ** -0.5
    group = hq // hkv

    qf = q.astype(jnp.float32)
    kf = jnp.repeat(k.astype(jnp.float32), group, axis=1)
    vf = jnp.repeat(v.astype(jnp.float32), group, axis=1)
    gf = g.astype(jnp.float32)

    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    allowed = _mask(sq, skv, causal, window)[None, None]
    s = jnp.where(allowed, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.any(allowed, axis=-1, keepdims=True), p, 0.0)

    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    # dS = P * (dP - rowsum(dP * P))  (softmax Jacobian)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale

    if group > 1:  # fold q-head-group gradients back onto the KV heads
        dk = dk.reshape(b, hkv, group, skv, d).sum(axis=2)
        dv = dv.reshape(b, hkv, group, skv, d).sum(axis=2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_fwd, _bwd)
