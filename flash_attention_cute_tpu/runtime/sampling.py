"""Token sampling: greedy, temperature, top-k, top-p.

The reference only implements greedy argmax decoding
(reference: scripts/benchmark_llm.py:86, :109); sampling is part of making
this a complete serving runtime.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => disabled
    top_p: float = 1.0  # 1 => disabled


def filter_logits(
    logits: jax.Array, params: SamplingParams
) -> jax.Array:
    """Temperature-scale + top-k/top-p mask (suppressed entries -> -inf).

    `softmax(filter_logits(l))` is the EXACT distribution `sample_token`
    draws from — rejection-sampling speculative decoding accepts/rejects
    against these filtered distributions (runtime/speculative.py)."""
    assert params.temperature > 0.0
    logits = logits / params.temperature

    if params.top_k > 0:
        kth = jax.lax.top_k(logits, params.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest prefix with cumulative prob >= top_p (always
        # keep the argmax itself).
        keep_sorted = cum - probs < params.top_p
        threshold = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < threshold, -jnp.inf, logits)

    return logits


def sample_token(
    logits: jax.Array,
    key: jax.Array | None,
    params: SamplingParams = SamplingParams(),
) -> jax.Array:
    """logits [B, V] -> token ids [B] int32."""
    if params.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    assert key is not None, "sampling with temperature > 0 needs a PRNG key"
    return jax.random.categorical(
        key, filter_logits(logits, params), axis=-1
    ).astype(jnp.int32)
