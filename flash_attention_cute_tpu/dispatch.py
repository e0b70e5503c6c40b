"""Shape-specialized kernel dispatch.

TPU-native replacement for the reference's three dispatch tiers:

  * `csrc/kernel_dispatcher.h:21-52` — runtime dtype/headdim/bool ->
    compile-time template parameter chain. In JAX, `jit` specialization by
    (shape, dtype, static args) plays the role of template instantiation;
    this module picks the *block configuration* per call signature.
  * `csrc/flash_attention_impl.cu:8-26` — hardware-keyed block sizes
    (128x64 on 64KB-smem parts vs 128x32 on 48KB parts). Here, block sizes
    are keyed on the TPU generation's VMEM budget and on the problem shape.
  * `flash_attention/flash_attention.py:6-43` — device routing: CUDA kernel
    vs CPU SDPA fallback. Here: Pallas on TPU, pure-XLA reference elsewhere
    (tests exercise the Pallas path via interpret mode explicitly).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    """Tile sizes for the flash-attention kernels."""
    block_q: int = 512
    block_kv: int = 512
    # Decode path
    decode_block_kv: int = 2048
    decode_num_splits: int = 0  # 0 = heuristic inside the kernel wrapper


@functools.cache
def tpu_generation() -> int:
    """Best-effort TPU generation probe (0 = not a TPU)."""
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return 0
    if dev.platform != "tpu":
        return 0
    kind = getattr(dev, "device_kind", "").lower()
    for gen in (7, 6, 5, 4, 3, 2):
        if f"v{gen}" in kind:
            return gen
    return 4


@functools.cache
def on_tpu() -> bool:
    if os.environ.get("FACT_FORCE_INTERPRET"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def select_block_config(
    *,
    dtype,
    head_dim: int,
    q_len: int,
    kv_len: int,
    causal: bool,
) -> BlockConfig:
    """Pick tile sizes for a call signature.

    Heuristics (the TPU analog of the reference's smem-capacity-keyed choice,
    reference: csrc/flash_attention_impl.cu:14-25):
      * v4+ cores have >= 16 MB VMEM; 512x512 fp32 score tiles (1 MB) plus
        double-buffered K/V blocks fit comfortably for head_dim <= 128.
      * Shorter sequences clamp the blocks (handled again in the wrappers).
      * Larger head dims shrink block_kv to keep the K/V working set bounded.
    """
    # v5e sweep (round 2, lazy-max kernel): causal wants 512x512 (fine
    # diagonal granularity); non-causal wants 512x1024 with 8 inner
    # sub-blocks (147 TF/s vs 119 at the old 1024x512).
    block_q = 512
    block_kv = 512 if causal else 1024
    d_pad = max(128, -(-head_dim // 128) * 128)
    if d_pad > 128:
        block_q = min(block_q, 512)
        block_kv = 256
    if q_len <= 256:
        block_q = 256
    # Decode is pure HBM streaming: large KV blocks amortize per-step
    # overhead (v5e sweep: 512 -> 537 GB/s, 2048 -> 836 GB/s at B8 S8k).
    return BlockConfig(
        block_q=block_q,
        block_kv=block_kv,
        decode_block_kv=2048 if d_pad <= 128 else 1024,
        decode_num_splits=0,
    )


def validate_inputs(q, k, v) -> None:
    """Precondition checks mirroring the reference's TORCH_CHECK battery
    (reference: csrc/flash_attention_api.cpp:17-59), minus the stride checks
    that have no meaning for XLA arrays.
    """
    import jax.numpy as jnp

    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        raise ValueError(
            f"q/k/v must be rank-4 [B, H, S, D]; got {q.shape}, {k.shape}, {v.shape}"
        )
    if k.shape != v.shape:
        raise ValueError(f"k and v shapes differ: {k.shape} vs {v.shape}")
    if q.shape[0] != k.shape[0]:
        raise ValueError(f"batch mismatch: {q.shape[0]} vs {k.shape[0]}")
    if q.shape[3] != k.shape[3]:
        raise ValueError(f"head_dim mismatch: {q.shape[3]} vs {k.shape[3]}")
    if q.shape[1] % k.shape[1] != 0:
        raise ValueError(
            f"num q heads ({q.shape[1]}) must be a multiple of num kv heads "
            f"({k.shape[1]})"
        )
    if q.dtype != k.dtype or q.dtype != v.dtype:
        raise ValueError(f"dtype mismatch: {q.dtype}, {k.dtype}, {v.dtype}")
    if q.dtype not in (jnp.bfloat16, jnp.float16, jnp.float32):
        raise ValueError(
            f"unsupported dtype {q.dtype}; need bf16/f16/f32 "
            "(reference supports fp16/bf16, csrc/flash_attention_api.cpp:27-31)"
        )
    if q.shape[3] > 256:
        raise ValueError(
            f"head_dim {q.shape[3]} > 256 unsupported "
            "(reference caps at 128, csrc/flash_attention_api.cpp:47-49)"
        )
