"""Pallas matmul ladder, step 1: one kernel invocation, whole arrays in VMEM.

TPU-native analog of the reference's pedagogy sidecar
(reference: examples/sgemm_1.cu — naive CuTe tiling): the smallest possible
Pallas program, introducing the pieces every later step builds on.

CUDA concept (reference)            ->  TPU/Pallas concept (here)
---------------------------------------------------------------
thread block / grid                 ->  `grid` of kernel invocations
shared memory staging (__shared__)  ->  VMEM `Ref`s (Pallas stages HBM->VMEM
                                        for you according to BlockSpec)
per-thread register accumulators    ->  whole-tile values; the VPU/MXU
                                        operate on (8,128)-tiled arrays
warp-level mma (m16n8k16)           ->  one `jnp.dot` lowered to the
                                        128x128 systolic MXU
__syncthreads()                     ->  not needed: a kernel body is a
                                        single dataflow program; Mosaic
                                        schedules the hardware

Like every reference example, main() verifies against a trusted host
computation (reference: examples/sgemm_1.cu:302-320 does a triple loop).

Run: python examples/matmul_1_naive.py [--interpret]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def matmul_kernel(a_ref, b_ref, o_ref):
    """The entire kernel: one MXU matmul over VMEM-resident operands.

    a_ref/b_ref/o_ref are *references* to VMEM buffers; `[...]` reads the
    whole tile as a value. `preferred_element_type=jnp.float32` keeps the
    systolic-array accumulation in fp32 even for bf16 inputs — the analog
    of the F32F16F16F32 mma shape the reference uses
    (reference: csrc/flash_attention_template.cuh:253-257).
    """
    o_ref[...] = jnp.dot(
        a_ref[...], b_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def matmul(a: jax.Array, b: jax.Array, interpret: bool = False) -> jax.Array:
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    return pl.pallas_call(
        matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        interpret=interpret,
    )(a, b)


def main():
    interpret = "--interpret" in sys.argv
    # Shapes small enough that A, B and O all fit VMEM (~16 MB) at once —
    # the naive step's defining limitation (step 2 removes it).
    m = n = k = 1024
    ka, kb = jax.random.split(jax.random.key(0))
    a = jax.random.normal(ka, (m, k), jnp.float32).astype(jnp.bfloat16)
    b = jax.random.normal(kb, (k, n), jnp.float32).astype(jnp.bfloat16)

    out = matmul(a, b, interpret=interpret)
    want = jnp.dot(
        a.astype(jnp.float32), b.astype(jnp.float32)
    ).astype(jnp.bfloat16)
    err = float(jnp.abs(out.astype(jnp.float32) - want.astype(jnp.float32)).max())
    print(f"matmul_1_naive: {m}x{k}x{n} bf16  max err vs fp32 host = {err:.3e}")
    assert err < 0.25, err  # bf16 output rounding over k=1024 accumulation
    print("PASS")


if __name__ == "__main__":
    main()
