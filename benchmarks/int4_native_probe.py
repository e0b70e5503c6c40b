"""Probe: cheaper int4 nibble-unpack variants for the qmm kernel.

qmm_shapes.py showed the int4 matmul at ~420-450 GB/s of int4 bytes vs
int8's 600-740: the unpack (~6 int32 VPU ops/element + converts) costs
~2x the per-block DMA, so the kernel is VPU-bound at decode shapes.

Native jnp.int4 storage (Mosaic converts int4->bf16 in hardware) is NOT
usable on this toolchain: int4 arrays cannot cross a jit boundary under
the axon plugin (device_put recurses; see r5chw log int4_native_probe),
and in-kernel lax.bitcast_convert_type int8->int4 raises
NotImplementedError("Changing bitwidths not supported"). So the probe
compares software unpack variants on the packed-int8 storage:

  packed      production kernel (_qmm4_pallas): astype(int32), &0xF,
              3-op sign-extend, >>4, concat, astype(bf16)
  biased_i32  nibbles stored UNSIGNED (u = q + 8): unpack is &0xF /
              (>>4)&0xF only (no sign-extend), no concat (groups slice
              straight off the lo/hi planes), exact -8 correction folded
              into the output via per-group row-sums of x
  biased_i8   same math with int8-dtype ops (no astype(int32)) — wins
              only if Mosaic packs sub-word int ops

NB: this probe predates the production switch to biased packing (its
measurements in benchmarks/r5chw_logs/ compare the OLD signed kernel
against the biased form; `rebias` maps signed->biased packing). After
the switch, ops/quantized_matmul.py IS the biased form, so re-running
"packed" here measures the new kernel and `rebias` double-biases —
treat this file as the recorded experiment, not a live harness.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/int4_native_probe.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_cute_tpu.ops import quantized_matmul as qm
from flash_attention_cute_tpu.utils.timing import time_chained

GROUP4 = qm.GROUP4


def _biased_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k, groups,
                   i8ops):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = w_ref[...]
    if i8ops:
        # uint8 keeps the ops sub-word; logical >> needs no mask after.
        p = p.astype(jnp.uint8)
        lo_u = p & 0xF             # unsigned nibble u = q + 8
        hi_u = p >> 4
    else:
        p = p.astype(jnp.int32)
        lo_u = p & 0xF
        hi_u = (p >> 4) & 0xF
    x = x_ref[...]
    half = groups // 2
    for g in range(groups):
        plane = lo_u if g < half else hi_u
        u = plane[(g % half) * GROUP4:((g % half) + 1) * GROUP4, :]
        if i8ops:  # Mosaic has no uint8->bf16 cast; hop through int8
            u = u.astype(jnp.int8)
        xg = x[:, g * GROUP4:(g + 1) * GROUP4]
        pg = jax.lax.dot_general(
            xg, u.astype(x.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # q = u - 8 exactly: subtract 8 * rowsum(x_g) * scale.
        corr = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[...] += (pg - 8.0 * corr) * s_ref[g:g + 1, :]

    @pl.when(i == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def biased_qmm(x2, wb, scales, *, bk=512, bn=2048, i8ops=False):
    """wb: [K_pad//2, N_pad] int8 holding biased nibbles (lo|hi<<4);
    scales [G, N_pad] f32."""
    t, n_pad = x2.shape[0], wb.shape[1]
    k_pad = 2 * wb.shape[0]
    bt = max(8, ((t + 7) // 8) * 8)
    bn = min(bn, n_pad)
    bk = min(bk, k_pad)
    groups = bk // GROUP4
    grid = (1, n_pad // bn, k_pad // bk)
    g_pad = max(8, groups)
    s = scales.reshape(grid[2], groups, n_pad)
    s = jnp.pad(s, ((0, 0), (0, g_pad - groups), (0, 0)))
    s_in = s.reshape(grid[2] * g_pad, n_pad)
    out = pl.pallas_call(
        functools.partial(_biased_kernel, n_k=grid[2], groups=groups,
                          i8ops=i8ops),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bk), lambda ti, ni, ki: (ti, ki)),
            pl.BlockSpec((bk // 2, bn), lambda ti, ni, ki: (ki, ni)),
            pl.BlockSpec((g_pad, bn), lambda ti, ni, ki: (ki, ni)),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda ti, ni, ki: (ti, ni)),
        out_shape=jax.ShapeDtypeStruct((bt, n_pad), x2.dtype),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(jnp.pad(x2, ((0, bt - t), (0, 0))), wb, s_in)
    return out[:t]


def rebias(values):
    """Packed signed nibbles -> packed unsigned (q+8) nibbles."""
    p = values.astype(jnp.int32)
    lo, hi = qm._unpack4(p)
    lo_u, hi_u = lo + 8, hi + 8
    return ((lo_u & 0xF) | (hi_u << 4)).astype(jnp.int8)


def main():
    shapes = {"square": (4096, 4096), "gate_up": (4096, 57344),
              "down": (14336, 4096)}
    t = 8
    for rep in range(2):
        for name, (k, n) in shapes.items():
            w = jax.random.normal(
                jax.random.key(1), (k, n), jnp.float32) * k ** -0.5
            qw = jax.jit(qm.quantize_weight_int4)(w)
            x = jax.random.normal(
                jax.random.key(2), (t, k), jnp.bfloat16)
            wb = jax.jit(rebias)(qw.values)

            if rep == 0:
                ref = qm._qmm4_pallas(x, qw, interpret=False)
                # NB: the sub-word (uint8-op) variant is OFF: its compile
                # reproducibly 500s the remote compile service (the
                # CLAUDE.md wedge hazard; int8 shifts are also
                # unimplemented arith.shrsi in this Mosaic).
                got = biased_qmm(x, wb, qw.scales, i8ops=False)
                err = float(jnp.abs(
                    ref.astype(jnp.float32)[:, :n]
                    - got.astype(jnp.float32)[:, :n]).max())
                print(f"{name}: biased_i32 err={err:.3e}")

            def chain_of(fn):
                def chain(nn):
                    @jax.jit
                    def f(x, v, s):
                        def body(i, x_):
                            o = fn(x_, v, s)
                            return (x_ + o[:, :1] * 1e-6).astype(x_.dtype)
                        out = jax.lax.fori_loop(0, nn, body, x)
                        return out[0, 0].astype(jnp.float32)
                    return f
                return chain

            wbytes = k * n * 0.5 + qw.scales.size * 4
            for label, fn, args in (
                ("packed", lambda x_, v, s: qm._qmm4_pallas(
                    x_, qm.QuantizedWeight4(
                        values=v, scales=s, in_dim=qw.in_dim, out=qw.out,
                        impl="pallas"), interpret=False),
                 (x, qw.values, qw.scales)),
                ("biased_i32", lambda x_, v, s: biased_qmm(
                    x_, v, s, i8ops=False), (x, wb, qw.scales)),
            ):
                t_it = time_chained(chain_of(fn), args, n1=10, n2=50)
                print(f"[rep {rep}] {name:8s} {label:12s} "
                      f"{t_it*1e6:8.1f} us  {wbytes/t_it/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
