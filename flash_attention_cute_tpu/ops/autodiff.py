"""Differentiable flash attention (custom VJP).

The reference is strictly forward-only — no backward kernel exists
(reference: SURVEY.md §2.2 "forward only (no backward, no dropout...)").
This module goes one step further than parity: the Pallas forward kernel
gets a `jax.custom_vjp` whose backward is the analytic attention gradient
evaluated with plain XLA ops (fp32, recompute-from-residuals — i.e.
FlashAttention-style "store nothing, recompute scores"), so `jax.grad`
works through the fused kernel on TPU for fine-tuning / RL loops.

The backward materializes one [block-free] S_q x S_kv score matrix per
(batch, head) in fp32 — reference-grade, not a Pallas backward kernel
(tracked as future work); prefer moderate sequence lengths for training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.api import flash_attention_forward


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: float | None = None,
    causal: bool = False,
    window: int | None = None,
) -> jax.Array:
    """Differentiable attention: Pallas forward, analytic XLA backward.

    Layout [B, H, S, D] like `flash_attn_func`; GQA/MQA supported (KV
    gradients sum over the query-head group).
    """
    return flash_attention_forward(
        q, k, v, softmax_scale=sm_scale, causal=causal, window=window
    )


def _fwd(q, k, v, sm_scale, causal, window):
    out = flash_attention(q, k, v, sm_scale, causal, window)
    return out, (q, k, v)


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


def _bwd(sm_scale, causal, window, res, g):
    q, k, v = res
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
