"""Pallas matmul ladder, step 4: fusion — epilogues and quantized operands.

Where the reference's ladder tops out at an sm80 multistage fp32 gemm
(reference: examples/sgemm_sm80_multistage.cu), the TPU ladder's last step
teaches the two fusions that matter for an inference engine:

1. EPILOGUE FUSION: bias-add + activation computed on the fp32 accumulator
   while it is still in VMEM, before the single down-cast store. On GPU
   this is an epilogue visitor / a second kernel; in Pallas it is three
   lines in the same kernel body. This is the same principle as keeping
   the online softmax between the two matmuls of flash attention
   (reference: csrc/flash_attention_template.cuh:445-487) — never round-trip
   an intermediate through HBM.

2. QUANTIZED OPERANDS: int8 weights dequantized INSIDE the kernel after
   the VMEM load, feeding the MXU at higher effective HBM bandwidth —
   the standalone version of the fused dequant in the quantized-KV
   attention kernel (flash_attention_cute_tpu/ops/quantized.py; an open
   TODO in the reference, README.md:22).

Run: python examples/matmul_4_fused.py [--interpret]
"""

from __future__ import annotations

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_kernel(a_ref, b_ref, bias_ref, scale_ref, o_ref, acc_ref, *,
                 quantized: bool):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    b = b_ref[...]
    if quantized:
        # Per-output-column int8 dequant fused after the VMEM load: B was
        # stored as int8 + one f32 scale per column, so the HBM traffic for
        # the weights is 2x (vs bf16) / 4x (vs f32) smaller.
        b = b.astype(jnp.bfloat16) * scale_ref[...].astype(jnp.bfloat16)

    acc_ref[...] += jnp.dot(
        a_ref[...], b, preferred_element_type=jnp.float32
    )

    @pl.when(kk == pl.num_programs(2) - 1)
    def _epilogue():
        # Bias + GELU on the still-resident fp32 accumulator: zero extra
        # HBM traffic, one down-cast store.
        acc = acc_ref[...] + bias_ref[...].astype(jnp.float32)
        o_ref[...] = jax.nn.gelu(acc).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "quantized",
                     "interpret"),
)
def fused_matmul(
    a: jax.Array,  # [M, K] bf16
    b: jax.Array,  # [K, N] bf16 or int8
    bias: jax.Array,  # [N]
    scale: jax.Array | None = None,  # [N] f32, required when b is int8
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
    quantized: bool = False,
    interpret: bool = False,
) -> jax.Array:
    m, k = a.shape
    _, n = b.shape
    assert m % block_m == 0 and n % block_n == 0 and k % block_k == 0
    if scale is None:
        scale = jnp.ones((n,), jnp.float32)

    return pl.pallas_call(
        functools.partial(fused_kernel, quantized=quantized),
        grid=(m // block_m, n // block_n, k // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a, b, bias[None], scale[None])


def main():
    interpret = "--interpret" in sys.argv
    m = n = k = 512 if interpret else 1024
    ka, kb, kc = jax.random.split(jax.random.key(0), 3)
    a = jax.random.normal(ka, (m, k), jnp.float32).astype(jnp.bfloat16)
    bf = jax.random.normal(kb, (k, n), jnp.float32)
    bias = jax.random.normal(kc, (n,), jnp.float32).astype(jnp.bfloat16)

    # ---- bf16 epilogue fusion ----
    b16 = bf.astype(jnp.bfloat16)
    out = fused_matmul(a, b16, bias, interpret=interpret)
    want = jax.nn.gelu(
        jnp.dot(a.astype(jnp.float32), b16.astype(jnp.float32))
        + bias.astype(jnp.float32)
    )
    rel = float(jnp.abs(out.astype(jnp.float32) - want).max()
                / jnp.abs(want).max())
    print(f"fused bias+gelu bf16: rel err {rel:.2e}")
    assert rel < 5e-3, rel

    # ---- int8-weight fusion ----
    scale = (jnp.abs(bf).max(axis=0) / 127.0).astype(jnp.float32)
    b_q = jnp.clip(jnp.round(bf / scale), -127, 127).astype(jnp.int8)
    out_q = fused_matmul(a, b_q, bias, scale=scale, quantized=True,
                         interpret=interpret)
    want_q = jax.nn.gelu(
        jnp.dot(
            a.astype(jnp.float32),
            b_q.astype(jnp.float32) * scale[None, :],
        )
        + bias.astype(jnp.float32)
    )
    rel_q = float(jnp.abs(out_q.astype(jnp.float32) - want_q).max()
                  / jnp.abs(want_q).max())
    print(f"fused int8-dequant:   rel err {rel_q:.2e}")
    assert rel_q < 1e-2, rel_q
    print("PASS")


if __name__ == "__main__":
    main()
