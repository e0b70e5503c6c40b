"""User-facing attention API.

`flash_attn_func(q, k, v, softmax_scale=None, causal=False)` mirrors the
reference's Python entry point (reference: flash_attention/flash_attention.py:46-53)
including the default-scale rule, the [B, H, S, D] layout, and the device
routing (Pallas kernel on TPU, XLA reference elsewhere — the analog of the
CUDA-kernel / CPU-SDPA split at reference: flash_attention.py:6-43).

Routing rules:
  * seqlen_q == 1 (decode)  -> split-KV decode kernel with GQA q-head packing
    (the reference's pack-head-q fast path, csrc/flash_attention_api.cpp:72-83).
  * otherwise (prefill)     -> fused flash-attention forward kernel.
  * non-TPU backend         -> fp32 XLA reference (unless interpret=True runs
    the Pallas kernels in interpreter mode, used by the test suite).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu import dispatch
from flash_attention_cute_tpu.ops.flash_decode import flash_attention_decode
from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd
from flash_attention_cute_tpu.ops.reference import attention_reference


def flash_attention_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    softmax_scale: float | None = None,
    causal: bool = False,
    kv_length: jax.Array | None = None,
    q_offset: jax.Array | None = None,
    window: int | None = None,
    *,
    stable: bool | str = True,
    logit_softcap: float | None = None,
    score_dtype: str | None = None,
    block_config: dispatch.BlockConfig | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Dispatching attention forward. See `flash_attn_func`.

    `kv_length` ([B] int32) optionally marks the valid prefix of k/v — used by
    the decode path over a preallocated cache. `q_offset` ([B] int32) is the
    global position of q row 0 for chunked prefill (causality becomes
    `col <= q_offset + row`). `window` is the sliding-window size in
    HF/Qwen2 semantics (the reference raises on sliding windows,
    models/modeling_qwen2.py:261-269; here supported natively).
    `stable` picks the prefill softmax mode: True (default) = lazy running
    max (max tree off the critical path; exact unless a score jumps >110
    log2-units past the running max, then graceful saturation);
    "strict" = classic FA2 current-block max (always exact, slower);
    False = no running max at all (fastest; safe only below ~88 nats —
    keep the default for anything untrusted).
    `score_dtype="int8"` opts the dense-prefill path into the int8 MXU
    QK^T (2x score-matmul rate, ~1e-2 output error — a speed/accuracy
    trade); only the dense prefill kernel supports it, other routes
    raise.
    """
    dispatch.validate_inputs(q, k, v)
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape

    if score_dtype is not None and (
        sq == 1 or kv_length is not None or q_offset is not None
    ):
        raise ValueError(
            "score_dtype is supported only on the dense prefill path "
            "(decode / chunked-extend routes run bf16 scores)"
        )

    use_pallas = dispatch.on_tpu() or bool(interpret)
    if not use_pallas:
        return attention_reference(
            q, k, v, softmax_scale=softmax_scale, causal=causal,
            kv_length=kv_length, q_offset=q_offset, window=window,
            logit_softcap=logit_softcap,
        )

    interp = bool(interpret)
    cfg = block_config or dispatch.select_block_config(
        dtype=q.dtype, head_dim=d, q_len=sq, kv_len=skv, causal=causal,
    )

    if sq == 1:
        # Decode: causal is vacuous under bottom-right alignment
        # (reference: csrc/flash_attention_api.cpp:99 drops it too).
        return flash_attention_decode(
            q, k, v,
            kv_length=kv_length,
            sm_scale=softmax_scale,
            window=window,
            logit_softcap=logit_softcap,
            num_splits=cfg.decode_num_splits,
            block_kv=cfg.decode_block_kv,
            interpret=interp,
        )

    if kv_length is not None or q_offset is not None:
        # Chunked prefill over a partially filled cache (mode="extend"):
        # scalar-prefetch kernel, one compile for every fill level.
        from flash_attention_cute_tpu.ops.flash_chunked import (
            flash_attention_chunked,
        )
        if kv_length is None:
            kv_length = jnp.full((b,), skv, jnp.int32)
        if q_offset is None:
            # Shape-derived bottom-right offset per batch.
            q_offset = kv_length - sq
        return flash_attention_chunked(
            q, k, v, q_offset, kv_length,
            sm_scale=softmax_scale, causal=causal, window=window,
            logit_softcap=logit_softcap,
            block_q=cfg.block_q, block_kv=cfg.block_kv, interpret=interp,
        )

    if (
        logit_softcap is None and score_dtype is None and stable is True
        and block_config is None
    ):
        # Dense prefill at default knobs: route through the custom-VJP op
        # so jax.grad works through model forwards ON TPU (the Pallas
        # recompute backward). Free when not differentiating — custom_vjp
        # runs this exact primal. Non-default knobs (softcap, int8 scores,
        # explicit configs) keep the direct call below and stay
        # forward-only.
        from flash_attention_cute_tpu.ops.autodiff import flash_attention

        return flash_attention(
            q, k, v, softmax_scale, causal, window, interpret
        )

    return flash_attention_fwd(
        q, k, v,
        sm_scale=softmax_scale,
        causal=causal,
        window=window,
        block_q=cfg.block_q,
        block_kv=cfg.block_kv,
        stable=stable,
        logit_softcap=logit_softcap,
        score_dtype=score_dtype,
        interpret=interp,
    )


def flash_attn_func(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    softmax_scale: float | None = None,
    causal: bool = False,
    **kwargs,
) -> jax.Array:
    """Drop-in analog of the reference `flash_attn_func`.

    Args:
      q: [batch, n_q_heads, q_seq_len, head_dim]
      k: [batch, n_kv_heads, kv_seq_len, head_dim]
      v: [batch, n_kv_heads, kv_seq_len, head_dim]
      softmax_scale: defaults to head_dim ** -0.5
      causal: bottom-right-aligned causal masking

    Returns: [batch, n_q_heads, q_seq_len, head_dim] in q's dtype.
    """
    if softmax_scale is None:
        softmax_scale = q.shape[-1] ** -0.5
    return flash_attention_forward(
        q, k, v, softmax_scale=softmax_scale, causal=causal, **kwargs
    )
