"""flash_attention_cute_tpu — a TPU-native attention-centric LLM inference engine.

A from-scratch JAX/Pallas/pjit framework with the capabilities of the CUDA
reference (izmttk/flash_attention_cute): a fused QK^T -> online-softmax -> PV
flash-attention forward kernel, shape-specialized dispatch, GQA/MQA with
decode-time q-head-group packing, and Llama / Qwen2 model integration —
extended with split-KV flash decoding, paged KV cache, quantized KV, and
multi-chip sharding, which the reference lists as roadmap TODOs.

Public API mirrors the reference's `flash_attention` package
(reference: flash_attention/flash_attention.py:46-53):

    from flash_attention_cute_tpu import flash_attn_func
    o = flash_attn_func(q, k, v, softmax_scale=None, causal=True)

with q/k/v laid out [batch, heads, seq, head_dim] exactly like the reference
custom op.
"""

from flash_attention_cute_tpu.api import flash_attn_func, flash_attention_forward
from flash_attention_cute_tpu.ops.reference import attention_reference
from flash_attention_cute_tpu.ops.flash_varlen import flash_attention_varlen

__version__ = "0.1.0"

__all__ = [
    "flash_attn_func",
    "flash_attention_forward",
    "flash_attention_varlen",
    "attention_reference",
    "__version__",
]
