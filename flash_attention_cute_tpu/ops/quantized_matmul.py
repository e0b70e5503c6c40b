"""Int8 weight-only quantized matmul (Pallas, dequant fused into the tile
stream).

Why: decode is weights-bandwidth-bound — the serving engine already runs
at 96-99% of the bf16 weights-streaming floor (BASELINE.md decode
attribution), so the one remaining 2x lever on decode throughput is
halving the bytes each step streams. Weights are stored int8 with one
fp32 scale per OUTPUT channel (symmetric, absmax); the kernel streams
int8 tiles HBM->VMEM, casts to the activation dtype on the VPU (which
overlaps the next tile's DMA under the Pallas pipeline), runs the MXU
matmul, and applies the per-channel scale once after the fp32
accumulation — `x @ (v * s) == (x @ v) * s` exactly, because `s` is
constant along the contraction axis.

The reference has no weight quantization (its README lists only
quantized *kernels* as a TODO, reference: README.md:22); this is a
"beyond" feature of the same kind as the int8 KV cache in
ops/quantized.py.

Two implementations, chosen at quantize time (static aux field, so the
choice is a jit specialization key, not a traced value):

  * impl="pallas" (default): the fused kernel above. Single-chip only —
    a Pallas call is opaque to GSPMD, so under a pjit mesh it would be
    replicated, not partitioned.
  * impl="xla": `(x @ values.astype(dtype)) * scales` as plain XLA ops.
    GSPMD partitions this like any dense matmul (values keep the same
    PartitionSpec as the bf16 weight they replace), so this is the form
    to use for tensor-parallel meshes. XLA materializes the dequantized
    shard per call, so it keeps the memory win (params at rest) but not
    the full streaming win.

Padding contract: `quantize_weight` pads the contraction axis up to the
kernel's K tile and the output axis up to the N tile (zero values, unit
scales); `quantized_matmul` pads activations with zeros on the right
(zero rows of `values` make the padding exact) and slices the logical
output columns back out.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_cute_tpu.dispatch import on_tpu

LANES = 128
# K/N tile caps, swept on v5e hardware (benchmarks/qmm_sweep.py, round-5
# logs): 512x512 tiles (256 KB) were the sweep's WORST decode config —
# the per-grid-step DMA is too small to hide HBM latency at T=8
# (int8 520-540 GB/s). Bigger N tiles fix it: int4 at 512x2048 streams
# ~575 GB/s decode-shape (and ran the full 8-layer and 32-layer models
# on chip). The int8 kernel at bn=2048 measured 730-745 GB/s in the
# isolated sweep but REPRODUCIBLY WEDGED the axon compile service when
# compiled again later the same day (benchmarks/qmm_bisect.py: even the
# sweep's own 4096x4096 shape hung; two full-tunnel outages) — int8
# ships bn=1024 instead: 692 GB/s in both sweep reps (+30% over the old
# default), zero padded columns at every Llama width (14336 = 14*1024,
# 129024 = 126*1024), and a compile the service handles. BLOCK_K stays
# 512 so the int4 nibble-pack block (and any saved int4 checkpoint) is
# unchanged.
BLOCK_K = 512
BLOCK_N = 2048   # int4 kernel N tile
BLOCK_N8 = 1024  # int8 kernel N tile
BLOCK_T = 256  # row tile cap (prefill); decode rows pad to 8 sublanes


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantizedWeight:
    """Per-output-channel symmetric int8 weight.

    values [..., K_pad, N_pad] int8; scales [..., N_pad] f32. `in_dim`
    and `out` are the LOGICAL contraction/output widths (the pads carry
    zero values and unit scales). Layer-stacked leaves
    carry a leading L axis on both fields and slice per layer under
    `lax.scan` like any pytree.
    """

    values: Any
    scales: Any
    in_dim: int = dataclasses.field(metadata=dict(static=True))
    out: int = dataclasses.field(metadata=dict(static=True))
    impl: str = dataclasses.field(default="pallas", metadata=dict(static=True))

    @property
    def dtype(self):  # duck-type the jnp.ndarray surface models probe
        return jnp.int8

    @property
    def shape(self):
        return self.values.shape[:-1] + (self.out,)


def quantize_weight(w: jax.Array, impl: str = "pallas") -> QuantizedWeight:
    """Quantize a [..., K, N] weight to int8 with per-N absmax scales.

    Layer-stacked weights ([L, K, N]) quantize one layer at a time via
    `lax.map`: the fp32 working copy is the single largest transient of
    device-side quantization, and at fused full-width shapes the stacked
    transient alone (e.g. gate_up [8, 4096, 57344] fp32 = 7.5 GB) OOMs a
    16 GB chip that holds the bf16 image — per-layer it is bounded at
    one layer's fp32 slab."""
    assert impl in ("pallas", "xla"), impl
    if w.ndim > 2:
        lead = w.shape[:-2]
        mapped = jax.lax.map(
            lambda wl: quantize_weight(wl, impl=impl),
            w.reshape((-1,) + w.shape[-2:]),
        )
        return QuantizedWeight(
            values=mapped.values.reshape(lead + mapped.values.shape[1:]),
            scales=mapped.scales.reshape(lead + mapped.scales.shape[1:]),
            in_dim=mapped.in_dim, out=mapped.out, impl=impl,
        )
    k, n = w.shape[-2], w.shape[-1]
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)  # [..., N]
    scales = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(wf / scales[..., None, :]).astype(jnp.int8)
    k_pad = _round_up(k, min(BLOCK_K, _round_up(k, LANES)))
    n_pad = _round_up(n, min(BLOCK_N8, _round_up(n, LANES)))
    pad = [(0, 0)] * (w.ndim - 2) + [(0, k_pad - k), (0, n_pad - n)]
    q = jnp.pad(q, pad)
    scales = jnp.pad(
        scales, pad[:-2] + [pad[-1]], constant_values=1.0
    )
    return QuantizedWeight(values=q, scales=scales, in_dim=k, out=n,
                           impl=impl)


def dequantize_weight(qw: QuantizedWeight, dtype=jnp.float32) -> jax.Array:
    """The exact bf16/f32 weight the kernel's math is equivalent to
    (padding stripped) — the parity oracle for tests."""
    w = qw.values.astype(jnp.float32) * qw.scales[..., None, :]
    return w[..., : qw.in_dim, : qw.out].astype(dtype)


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(x_ref.dtype)  # int8 -> activation dtype (VPU)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_k - 1)
    def _done():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _qmm_pallas(x2: jax.Array, qw: QuantizedWeight,
                interpret: bool) -> jax.Array:
    t, k = x2.shape
    k_pad, n_pad = qw.values.shape[-2], qw.values.shape[-1]
    bt = min(BLOCK_T, _round_up(t, 8))
    bk = min(BLOCK_K, k_pad)
    bn = min(BLOCK_N8, n_pad)
    t_pad = _round_up(t, bt)
    if (t_pad, k_pad) != (t, k):
        x2 = jnp.pad(x2, ((0, t_pad - t), (0, k_pad - k)))
    grid = (t_pad // bt, n_pad // bn, k_pad // bk)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bk), lambda ti, ni, ki: (ti, ki)),
            pl.BlockSpec((bk, bn), lambda ti, ni, ki: (ki, ni)),
            pl.BlockSpec((1, bn), lambda ti, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda ti, ni, ki: (ti, ni)),
        out_shape=jax.ShapeDtypeStruct((t_pad, n_pad), x2.dtype),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, qw.values, qw.scales.reshape(1, n_pad))
    return out[:t, : qw.out]


def quantized_matmul(x: jax.Array, qw) -> jax.Array:
    """x [..., K] @ qw -> [..., out] in x.dtype (fp32 accumulation).

    Accepts either an int8 `QuantizedWeight` or an int4
    `QuantizedWeight4` (dispatch on the leaf type, mirroring
    models/layers.dense)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    if isinstance(qw, QuantizedWeight4):
        if qw.impl == "xla":
            # Materialize the dequantized (padded) weight; padded K rows
            # are exact zeros so slicing back to the logical K is exact.
            w = _dequant4_padded(qw).astype(x.dtype)[..., :k, :]
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return y[..., : qw.out].astype(x.dtype)
        x2 = x.reshape((-1, k))
        y = _qmm4_pallas(x2, qw, interpret=not on_tpu())
        return y.reshape(lead + (qw.out,))
    if qw.impl == "xla":
        # Padded K rows of `values` are zero, so slicing them off is
        # exact and keeps x unpadded (GSPMD-friendly plain dot).
        v = qw.values[..., :k, :].astype(x.dtype)
        y = jnp.dot(x, v, preferred_element_type=jnp.float32) * qw.scales
        return y[..., : qw.out].astype(x.dtype)
    x2 = x.reshape((-1, k))
    y = _qmm_pallas(x2, qw, interpret=not on_tpu())
    return y.reshape(lead + (qw.out,))


# ---------------------------------------------------------------------------
# Int4 grouped quantization (two weights per byte, 128-row K-group scales).
#
# Pure CAPACITY feature: int8 already saturates most of the decode
# bandwidth win at BASELINE depth (weights are only ~half the per-step
# byte budget, BASELINE.md round-4 table); int4's value is fitting the
# FULL-depth model plus a large KV pool on one 16 GB v5e (~4.3 GB of
# projection weights instead of ~8.6 int8 / ~15.5 bf16). Per-group
# scales (GROUP4=128 K rows) bound the absmax blast radius that makes
# per-channel int4 lossy. Single-chip only, like impl="pallas" int8.
# ---------------------------------------------------------------------------

GROUP4 = 128  # K rows per int4 scale group (= one MXU contraction pass)


def _pack_block(k_pad: int) -> int:
    """Nibble packing is block-local so a streamed K tile unpacks with
    two shifts + one concatenate (no interleave); the pack block must
    therefore equal the kernel's K tile. Both sides derive it from
    k_pad with this helper."""
    return min(BLOCK_K, k_pad)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantizedWeight4:
    """Group-wise symmetric int4 weight, nibble-packed.

    values [..., K_pad//2, N_pad] int8: within each pack block of
    `_pack_block(K_pad)` rows, the low nibbles hold the block's first
    half of rows and the high nibbles the second half. Nibbles are
    stored BIASED (u = q + 8, u in [0, 15]) so the kernel unpack needs
    no sign-extend (see _unpack4; round-5c format change — older saved
    int4 checkpoints hold signed nibbles and must be re-quantized).
    scales
    [..., K_pad//GROUP4, N_pad] f32: absmax/7 per (K group, output
    channel); padded groups/channels carry unit scales and zero values
    so padding is exact. Layer-stacked leaves slice under `lax.scan`
    like the int8 class."""

    values: Any
    scales: Any
    in_dim: int = dataclasses.field(metadata=dict(static=True))
    out: int = dataclasses.field(metadata=dict(static=True))
    impl: str = dataclasses.field(default="pallas", metadata=dict(static=True))

    @property
    def dtype(self):
        return jnp.int4

    @property
    def shape(self):
        return self.values.shape[:-2] + (
            2 * self.values.shape[-2], self.out)


def quantize_weight_int4(w: jax.Array, impl: str = "pallas") -> QuantizedWeight4:
    """Quantize a [..., K, N] weight to packed int4 with per-(128-row
    K group, N channel) absmax scales.

    Layer-stacked weights map per layer for the same transient-memory
    bound as `quantize_weight` (the int4 path's fp32 + int32 working
    copies are even larger)."""
    assert impl in ("pallas", "xla"), impl
    if w.ndim > 2:
        lead = w.shape[:-2]
        mapped = jax.lax.map(
            lambda wl: quantize_weight_int4(wl, impl=impl),
            w.reshape((-1,) + w.shape[-2:]),
        )
        return QuantizedWeight4(
            values=mapped.values.reshape(lead + mapped.values.shape[1:]),
            scales=mapped.scales.reshape(lead + mapped.scales.shape[1:]),
            in_dim=mapped.in_dim, out=mapped.out, impl=impl,
        )
    k, n = w.shape[-2], w.shape[-1]
    k_pad = _round_up(k, min(BLOCK_K, _round_up(k, 2 * GROUP4)))
    n_pad = _round_up(n, min(BLOCK_N, _round_up(n, LANES)))
    pad = [(0, 0)] * (w.ndim - 2) + [(0, k_pad - k), (0, n_pad - n)]
    wf = jnp.pad(w.astype(jnp.float32), pad)
    lead = wf.shape[:-2]
    grouped = wf.reshape(lead + (k_pad // GROUP4, GROUP4, n_pad))
    amax = jnp.max(jnp.abs(grouped), axis=-2)  # [..., G, N_pad]
    scales = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(grouped / scales[..., None, :]), -8, 7)
    q = q.astype(jnp.int32).reshape(lead + (k_pad, n_pad))
    bk = _pack_block(k_pad)
    qb = q.reshape(lead + (k_pad // bk, 2, bk // 2, n_pad))
    lo, hi = qb[..., 0, :, :] + 8, qb[..., 1, :, :] + 8  # biased u = q+8
    packed = jax.lax.bitcast_convert_type(
        (lo | (hi << 4)).astype(jnp.uint8), jnp.int8
    ).reshape(lead + (k_pad // 2, n_pad))
    return QuantizedWeight4(values=packed, scales=scales, in_dim=k, out=n,
                            impl=impl)


def _unpack4(p: jax.Array):
    """int32 packed bytes -> (low, high) SIGNED nibble values, int32.

    Storage is BIASED (u = q + 8, u in [0, 15]) as of round 5c: the
    in-kernel unpack is then 3 VPU ops (two masks + one shift) instead
    of 6 (no sign-extend), which moved the int4 matmul from VPU-bound
    ~430 GB/s to ~500-580 GB/s of int4 bytes at decode shapes
    (benchmarks/int4_native_probe.py). This host-side helper returns the
    signed values for dequant/tests. Checkpoints saved before the switch
    hold signed nibbles and do not restore correctly — re-quantize.
    """
    lo = (p & 0xF) - 8
    hi = ((p >> 4) & 0xF) - 8
    return lo, hi


def _dequant4_padded(qw: QuantizedWeight4) -> jax.Array:
    """f32 [..., K_pad, N_pad] dense image (padding kept: zero rows,
    so downstream slicing is exact)."""
    k2, n_pad = qw.values.shape[-2], qw.values.shape[-1]
    k_pad = 2 * k2
    bk = _pack_block(k_pad)
    lead = qw.values.shape[:-2]
    p = qw.values.astype(jnp.int32).reshape(
        lead + (k_pad // bk, bk // 2, n_pad))
    lo, hi = _unpack4(p)
    q = jnp.concatenate([lo, hi], axis=-2).reshape(
        lead + (k_pad // GROUP4, GROUP4, n_pad))
    w = q.astype(jnp.float32) * qw.scales[..., None, :]
    return w.reshape(lead + (k_pad, n_pad))


def dequantize_weight4(qw: QuantizedWeight4, dtype=jnp.float32) -> jax.Array:
    """The exact dense weight the kernel's math reproduces (padding
    stripped) — the parity oracle for tests."""
    return _dequant4_padded(qw)[..., : qw.in_dim, : qw.out].astype(dtype)


def _qmm4_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int,
                 groups: int):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # BIASED unpack (u = q + 8, see _unpack4): two masks + one shift —
    # no sign-extend and no lo/hi concat (each 128-row scale group sits
    # entirely in one nibble plane, so groups slice straight off the
    # planes). The signed form was VPU-bound at ~2x the per-block DMA
    # time; this form measured +18-35% on decode shapes
    # (benchmarks/int4_native_probe.py, bit-identical outputs for bf16
    # activations: all f32 accumulations here are exact sums).
    p = w_ref[...].astype(jnp.int32)  # [bk//2, bn] packed bytes
    lo_u = p & 0xF
    hi_u = (p >> 4) & 0xF
    x = x_ref[...]
    half = groups // 2
    # Per-group matmul then f32 scale: exact vs the dequant oracle
    # (`s` is constant along each 128-row contraction slice), and each
    # slice is one full MXU pass so the split costs no MXU efficiency.
    # q = u - 8 exactly: fold -8 * scale * rowsum(x_g) into the output.
    for g in range(groups):
        plane = lo_u if g < half else hi_u
        u = plane[(g % half) * GROUP4:((g % half) + 1) * GROUP4, :]
        xg = x[:, g * GROUP4:(g + 1) * GROUP4]
        pg = jax.lax.dot_general(
            xg, u.astype(x_ref.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        corr = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[...] += (pg - 8.0 * corr) * s_ref[g:g + 1, :]

    @pl.when(i == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


SUBLANES4 = 8  # Mosaic floor for an f32 block's second-to-last dim


def _qmm4_pallas(x2: jax.Array, qw: QuantizedWeight4,
                 interpret: bool) -> jax.Array:
    t, k = x2.shape
    k2, n_pad = qw.values.shape[-2], qw.values.shape[-1]
    k_pad = 2 * k2
    bt = min(BLOCK_T, _round_up(t, 8))
    bk = _pack_block(k_pad)
    bn = min(BLOCK_N, n_pad)
    groups = bk // GROUP4
    t_pad = _round_up(t, bt)
    if (t_pad, k_pad) != (t, k):
        # Padded weight rows are zero-valued, so zero-padding x is exact.
        x2 = jnp.pad(x2, ((0, t_pad - t), (0, k_pad - k)))
    grid = (t_pad // bt, n_pad // bn, k_pad // bk)
    # The logical scale plane is [G, N_pad] with G = k_pad//GROUP4 rows —
    # `groups` (<= 4) rows per streamed K block, which Mosaic rejects as a
    # block's sublane dim (must be a multiple of 8 or the full axis). Pad
    # each K block's group rows up to SUBLANES4 here (dead rows — the
    # kernel loop only reads the first `groups`), so the streamed scale
    # block is (8, bn). ~128 KB extra f32 per 8 MB weight; layout stays
    # per-call, the stored checkpoint format is unchanged.
    g_pad = _round_up(groups, SUBLANES4)
    scales = qw.scales.reshape(grid[2], groups, n_pad)
    scales = jnp.pad(scales, ((0, 0), (0, g_pad - groups), (0, 0)))
    scales = scales.reshape(grid[2] * g_pad, n_pad)
    out = pl.pallas_call(
        functools.partial(_qmm4_kernel, n_k=grid[2], groups=groups),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bk), lambda ti, ni, ki: (ti, ki)),
            pl.BlockSpec((bk // 2, bn), lambda ti, ni, ki: (ki, ni)),
            pl.BlockSpec((g_pad, bn), lambda ti, ni, ki: (ki, ni)),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda ti, ni, ki: (ti, ni)),
        out_shape=jax.ShapeDtypeStruct((t_pad, n_pad), x2.dtype),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, qw.values, scales)
    return out[:t, : qw.out]
