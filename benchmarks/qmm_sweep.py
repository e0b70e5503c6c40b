"""Tile sweep for the quantized weight-only matmuls (ops/quantized_matmul.py).

Decode streams every projection once per step, so the quantized matmul's
HBM efficiency bounds the quantized-weight decode rate (BASELINE round-4:
int8 weights measured 5.92 ms/token vs the ~4.4 ms byte-budget floor at
the 8-layer config — this sweep asks how much of that gap is tile
geometry). Measures GB/s of weight bytes streamed for decode-shaped
(T=8) and prefill-shaped (T=256) activations across BLOCK_K x BLOCK_N,
for the int8 and the int4 kernels, interleaved reps (run-to-run variance
rule, CLAUDE.md).

The first version of this sweep timed with a difference of two
independently-minimized Python-loop chains; on the tunneled link the two
mins decorrelate and the difference collapses to ~0 (the r4f log's
16777216 GB/s rows). This version chains iterations inside one jitted
fori_loop via utils/timing.time_chained — the only timing that survives
the tunnel (CLAUDE.md hardware rules).

Usage: python benchmarks/qmm_sweep.py  (on the TPU)
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_cute_tpu.ops import quantized_matmul as qm
from flash_attention_cute_tpu.utils.timing import time_chained


def time_config(x, qw, pallas_fn, reps=3):
    """s/call of pallas_fn(x, qw) via an on-device chained fori_loop."""
    k = x.shape[1]

    def make_chain(n):
        @jax.jit
        def f(x, values, scales):
            q = qw.__class__(values=values, scales=scales, in_dim=qw.in_dim,
                             out=qw.out, impl=qw.impl)

            def body(i, x_):
                y = pallas_fn(x_, q, interpret=False)
                # Output feeds the next activation: true data dependency.
                return (y[:, :k] * 1e-3).astype(x.dtype)

            out = jax.lax.fori_loop(0, n, body, x)
            return out[0, 0].astype(jnp.float32)

        return f

    return min(
        time_chained(make_chain, (x, qw.values, qw.scales), n1=4, n2=20)
        for _ in range(reps)
    )


def main():
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    K = N = 4096
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    shapes = {"decode_T8": 8, "prefill_T256": 256}
    grids = [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
             (2048, 512), (512, 2048), (4096, 512), (4096, 1024)]
    kernels = {
        "int8": (qm.quantize_weight, qm._qmm_pallas, 1.0),
        "int4": (qm.quantize_weight_int4, qm._qmm4_pallas, 0.5),
    }
    results = {}
    for rep in range(2):  # interleave the whole sweep twice
        for kname, (quant, pallas_fn, bytes_per_w) in kernels.items():
            for name, t in shapes.items():
                x = jnp.asarray(rng.standard_normal((t, K)), jnp.bfloat16)
                for bk, bn in grids:
                    if bk > K or bn > N:
                        continue
                    qm.BLOCK_K, qm.BLOCK_N, qm.BLOCK_N8 = bk, bn, bn
                    qw = quant(w)  # re-pad/pack under current blocks
                    try:
                        dt = time_config(x, qw, pallas_fn)
                    except Exception as e:  # int4 pack needs bk%256==0
                        print(f"[{rep}] {kname} {name} bk={bk} bn={bn} "
                              f"SKIP ({type(e).__name__})")
                        continue
                    gbs = K * N * bytes_per_w / dt / 1e9
                    results.setdefault((kname, name, bk, bn), []).append(gbs)
                    print(f"[{rep}] {kname} {name} bk={bk:5d} bn={bn:5d} "
                          f"{dt*1e3:7.3f} ms  {gbs:6.1f} GB/s weights")
    print("\nbest per kernel/shape (max over reps):")
    for kname in kernels:
        for name in shapes:
            rows = {kk: max(v) for kk, v in results.items()
                    if kk[0] == kname and kk[1] == name}
            if not rows:
                continue
            best = max(rows, key=rows.get)
            print(f"  {kname} {name}: bk={best[2]} bn={best[3]} "
                  f"{rows[best]:.1f} GB/s")


if __name__ == "__main__":
    main()
