"""Pallas TPU kernels and their XLA reference implementations.

Layout convention throughout: q [B, Hq, Sq, D], k/v [B, Hkv, Skv, D]
(matches the reference custom op, reference: csrc/flash_attention_api.cpp:14-135).
"""

from flash_attention_cute_tpu.ops.reference import attention_reference
from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd
from flash_attention_cute_tpu.ops.flash_decode import flash_attention_decode
from flash_attention_cute_tpu.ops.flash_chunked import flash_attention_chunked
from flash_attention_cute_tpu.ops.flash_varlen import (
    flash_attention_packed,
    flash_attention_varlen,
)
from flash_attention_cute_tpu.ops.paged_attention import paged_attention_decode
from flash_attention_cute_tpu.ops.quantized import (
    QuantizedKV,
    dequantize_kv,
    flash_attention_decode_quantized,
    paged_attention_decode_quantized,
    quantize_kv,
)
# NOTE: ops.autodiff imports the dispatch API (which imports these kernel
# modules), so it must be imported from its own module to avoid a cycle:
#   from flash_attention_cute_tpu.ops.autodiff import flash_attention

__all__ = [
    "attention_reference",
    "flash_attention_fwd",
    "flash_attention_decode",
    "flash_attention_chunked",
    "flash_attention_packed",
    "flash_attention_varlen",
    "paged_attention_decode",
    "flash_attention_decode_quantized",
    "paged_attention_decode_quantized",
    "QuantizedKV",
    "quantize_kv",
    "dequantize_kv",
]
