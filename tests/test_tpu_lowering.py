"""TPU (Mosaic) lowering regression tests, runnable on CPU.

CI runs every Pallas kernel in interpret mode, which skips Mosaic's
block-geometry checks — a BlockSpec whose last-two block dims violate the
(8, 128) divisibility rule passes the whole suite and then fails to
compile on real hardware (this exact gap shipped the int4 matmul with a
(groups=4, bn) scale block in round 4; every hardware step of the r4g
runbook died in `_check_block_mappings`). `jax.jit(...).trace(...)
.lower(lowering_platforms=("tpu",))` runs the full Mosaic lowering
pipeline without a TPU attached, so geometry bugs surface here instead.

These tests only LOWER (never execute): cheap, deterministic, no
hardware. Numerics stay covered by the interpret-mode suites; hardware
numerics by scripts/verify_*_hw.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_cute_tpu.ops import quantized_matmul as qm


def lower_for_tpu(fn, *args):
    return jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def _rand(shape, dtype, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype
    )


@pytest.mark.parametrize("t", [8, 256])
@pytest.mark.parametrize(
    "k,n", [(4096, 4096), (4096, 14336), (14336, 4096), (4096, 128256)]
)
def test_qmm_int8_lowers_for_tpu(t, k, n):
    w = _rand((k, n), jnp.float32)
    x = _rand((t, k), jnp.bfloat16, seed=1)
    qw = qm.quantize_weight(w)
    lower_for_tpu(
        lambda x, v, s: qm._qmm_pallas(
            x,
            qm.QuantizedWeight(values=v, scales=s, in_dim=k, out=n),
            interpret=False,
        ),
        x, qw.values, qw.scales,
    )


@pytest.mark.parametrize("t", [8, 256])
@pytest.mark.parametrize(
    "k,n", [(1024, 4096), (4096, 4096), (4096, 14336), (14336, 4096)]
)
def test_qmm_int4_lowers_for_tpu(t, k, n):
    """The round-4 regression: int4's scale plane must stream as full
    8-sublane blocks, not (groups, bn)."""
    w = _rand((k, n), jnp.float32)
    x = _rand((t, k), jnp.bfloat16, seed=1)
    qw = qm.quantize_weight_int4(w)
    lower_for_tpu(
        lambda x, v, s: qm._qmm4_pallas(
            x,
            qm.QuantizedWeight4(values=v, scales=s, in_dim=k, out=n),
            interpret=False,
        ),
        x, qw.values, qw.scales,
    )


def test_flash_fwd_lowers_for_tpu():
    from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd

    q = _rand((2, 8, 1024, 128), jnp.bfloat16)
    k = _rand((2, 2, 1024, 128), jnp.bfloat16, seed=1)
    v = _rand((2, 2, 1024, 128), jnp.bfloat16, seed=2)
    lower_for_tpu(
        functools.partial(flash_attention_fwd, causal=True, interpret=False),
        q, k, v,
    )


def test_flash_decode_lowers_for_tpu():
    from flash_attention_cute_tpu.ops.flash_decode import flash_attention_decode

    q = _rand((4, 8, 1, 128), jnp.bfloat16)
    k = _rand((4, 2, 2048, 128), jnp.bfloat16, seed=1)
    v = _rand((4, 2, 2048, 128), jnp.bfloat16, seed=2)
    lengths = jnp.full((4,), 2048, jnp.int32)
    lower_for_tpu(
        functools.partial(flash_attention_decode, interpret=False),
        q, k, v, lengths,
    )


def test_quant_decode_stacked_lowers_for_tpu():
    """The stacked (layer scalar-prefetch) quantized decode — the full-depth
    int8-KV hot path — must pass Mosaic block-geometry checks: its scale
    blocks are (1, 1, hkv, block_kv) with hkv(=8) as the sublane dim."""
    from flash_attention_cute_tpu.ops.quantized import (
        QuantizedKV, flash_attention_decode_quantized,
    )

    nl, b, hkv, skv, d = 4, 8, 8, 1152, 128
    kv = QuantizedKV(
        values=jnp.zeros((nl, b, hkv, skv, d), jnp.int8),
        scales=jnp.ones((nl, b, hkv, skv), jnp.float32),
    )
    q = _rand((b, 32, 1, d), jnp.bfloat16)
    lengths = jnp.full((b,), 1030, jnp.int32)
    lower_for_tpu(
        lambda q, kv, lens, lay: flash_attention_decode_quantized(
            q, kv, kv, kv_length=lens, layer=lay, interpret=False,
        ),
        q, kv, lengths, jnp.int32(2),
    )
