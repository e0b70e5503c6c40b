"""Pallas matmul ladder, step 2: grid tiling with a K-reduction loop.

TPU-native analog of the reference's vectorized tiled gemm
(reference: examples/sgemm_2.cu:94-130 — TiledCopy/TiledMMA with 128-bit
vectorized loads). What the reference does with explicit copy atoms and
MMA partitions, Pallas expresses declaratively:

  * the `grid` (i, j, kk) replaces the CUDA grid + the in-kernel k-loop;
  * each `BlockSpec`'s index_map says which (block_m, block_k) tile of A
    and (block_k, block_n) tile of B one invocation sees — Pallas emits
    the HBM->VMEM DMAs (the reference hand-codes LDG.128/STS.128 patterns);
  * the k dimension is declared "arbitrary" (sequential) because it's a
    reduction onto the fp32 accumulator scratch, while i/j parallelize
    across the two TensorCores of the chip;
  * vectorization/alignment falls out of the (8,128) native tile — there
    is no 128-bit-vector bookkeeping to get right by hand.

Tile-choice rule of thumb (the analog of the smem-capacity math in
reference: csrc/flash_attention_impl.cu:14-25): block_m*block_k +
block_k*block_n input tiles (x2 for double buffering, step 3) plus the
block_m*block_n fp32 accumulator must fit VMEM (~16 MB/core).

Run: python examples/matmul_2_tiled.py [--interpret]
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


def matmul_kernel(a_ref, b_ref, o_ref, acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # One MXU pass per (i, j, kk) grid cell, accumulating in fp32 scratch —
    # the role the per-warp register accumulator tCrC plays in the
    # reference (examples/sgemm_2.cu:94-130).
    acc_ref[...] += jnp.dot(
        a_ref[...], b_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(kk == pl.num_programs(2) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret")
)
def matmul(
    a: jax.Array,
    b: jax.Array,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    m, k = a.shape
    _, n = b.shape
    assert m % block_m == 0 and n % block_n == 0 and k % block_k == 0

    return pl.pallas_call(
        matmul_kernel,
        grid=(m // block_m, n // block_n, k // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a, b)


def main():
    interpret = "--interpret" in sys.argv
    m = n = k = 512 if interpret else 4096
    ka, kb = jax.random.split(jax.random.key(0))
    a = jax.random.normal(ka, (m, k), jnp.float32).astype(jnp.bfloat16)
    b = jax.random.normal(kb, (k, n), jnp.float32).astype(jnp.bfloat16)

    bm = bn = bk = 256 if interpret else 512
    out = matmul(a, b, block_m=bm, block_n=bn, block_k=bk,
                 interpret=interpret)
    want = jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32))
    err = float(jnp.abs(out.astype(jnp.float32) - want).max())
    rel = err / float(jnp.abs(want).max())
    print(f"matmul_2_tiled: {m}x{k}x{n} bf16 blocks=({bm},{bn},{bk})  "
          f"rel err = {rel:.3e}")
    assert rel < 5e-3, rel
    print("PASS")


if __name__ == "__main__":
    main()
