"""Model configuration.

One dataclass covers both families the reference integrates (Llama and
Qwen2 — reference: models/modeling_llama.py, models/modeling_qwen2.py);
the architectural deltas are all config bits:
  * Qwen2 adds QKV projection biases (reference: modeling_qwen2.py:211-214)
  * Qwen2 may tie word embeddings
  * RoPE scaling variants come from the Llama fork
    (reference: modeling_llama.py:75-151: default / linear / dynamic-NTK)
    plus the llama3 scheme used by Llama-3.x checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeScaling:
    rope_type: str = "default"  # default | linear | dynamic | llama3
    factor: float = 1.0
    # llama3-specific
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: RopeScaling | None = None
    attention_bias: bool = False  # Qwen2: True
    tie_word_embeddings: bool = False
    # Sliding-window attention (Qwen2): when use_sliding_window, layers with
    # index >= max_window_layers attend through a `sliding_window`-sized
    # window (HF semantics). The reference *raises* on sliding windows
    # (reference: models/modeling_qwen2.py:261-269); here it is native.
    sliding_window: int | None = None
    use_sliding_window: bool = False
    max_window_layers: int = 0
    # Gemma-style tanh soft-capping of attention logits; plumbed through
    # every kernel path (prefill/decode/extend, dense/paged/quantized).
    logit_softcap: float | None = None
    # ---- Gemma2 architecture bits (defaults preserve Llama/Qwen2) ----
    hidden_activation: str = "silu"  # "silu" | "gelu_tanh" (Gemma GeGLU)
    attention_scale: float | None = None  # None -> head_dim**-0.5;
    # Gemma2 uses query_pre_attn_scalar**-0.5 (can differ from head_dim)
    final_logit_softcap: float | None = None  # tanh cap on LM logits
    sandwich_norms: bool = False  # Gemma2: post-attention and pre/post-
    # feedforward RMSNorms around each residual branch
    scale_embeddings: bool = False  # Gemma: embeddings * sqrt(hidden)
    rms_norm_plus_one: bool = False  # Gemma RMSNorm computes x*(1+w);
    # conversion folds the +1 into the stored weight (model code is
    # unchanged) — this flag only drives convert.py
    # Per-layer sliding-window pattern, repeated every len(pattern)
    # layers (Gemma2: (sliding_window, None) — even layers windowed).
    # None falls back to the suffix semantics above (Qwen2).
    layer_window_pattern: tuple | None = None
    dtype: Any = jnp.bfloat16

    @property
    def q_per_kv(self) -> int:
        return self.num_q_heads // self.num_kv_heads

    def __post_init__(self):
        assert self.num_q_heads % self.num_kv_heads == 0
        if self.layer_window_pattern is not None:
            assert self.num_layers % len(self.layer_window_pattern) == 0, (
                "layer_window_pattern must tile num_layers"
            )
            assert not self.use_sliding_window, (
                "layer_window_pattern and use_sliding_window (suffix "
                "semantics) are mutually exclusive"
            )


def tiny_test_config(**overrides) -> ModelConfig:
    """A small config for unit tests (Llama-shaped GQA)."""
    base = dict(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_q_heads=4,
        num_kv_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        dtype=jnp.float32,
    )
    base.update(overrides)
    return ModelConfig(**base)
