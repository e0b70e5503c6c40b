"""Token sampling: greedy, temperature, top-k, top-p, min-p.

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
    min_p: float = 0.0  # 0 => disabled; keep tokens with p >= min_p * p_max


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

    if params.min_p > 0.0:
        # p_i / p_max = exp(l_i - l_max) >= min_p  <=>  l_i >= l_max +
        # ln(min_p). The ratio is renormalization-invariant, so applying
        # it after the top-k/top-p masks (whose survivors include the
        # argmax) matches the usual "min-p over the filtered
        # distribution" definition without any sort or softmax.
        lmax = jnp.max(logits, axis=-1, keepdims=True)
        cut = lmax + jnp.log(jnp.float32(params.min_p)).astype(logits.dtype)
        logits = jnp.where(logits < cut, -jnp.inf, logits)

    return logits


def apply_penalties(
    logits: jax.Array,
    prompt_counts: jax.Array,
    out_counts: jax.Array,
    rep: jax.Array,
    pres: jax.Array,
    freq: jax.Array,
) -> jax.Array:
    """Repetition / presence / frequency penalties on raw logits.

    Semantics match the ecosystem conventions the serving engines expose:
      * repetition `rep` (HF RepetitionPenaltyLogitsProcessor): tokens seen
        in the PROMPT OR the output get `l/rep` when l > 0 else `l*rep`.
      * presence `pres`, frequency `freq` (OpenAI API): subtract
        `pres * 1[count>0] + freq * count` over OUTPUT tokens only.

    Shapes: `logits` [..., V]; the count planes broadcast against it;
    `rep`/`pres`/`freq` broadcast against `logits.shape[:-1]` (the caller
    adds singleton axes for extra leading dims). Applied to RAW model
    logits, before guided-decoding bias / DFA masks / temperature — so
    -inf entries stay -inf and the penalized logits feed `filter_logits`
    unchanged, which keeps speculative rejection sampling exact against
    the penalized target distribution."""
    rep = rep[..., None]
    seen = (prompt_counts + out_counts) > 0
    logits = jnp.where(
        seen & (logits > 0), logits / rep,
        jnp.where(seen, logits * rep, logits),
    )
    return (
        logits
        - freq[..., None] * out_counts
        - pres[..., None] * (out_counts > 0)
    )


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
