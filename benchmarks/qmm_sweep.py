"""Tile sweep for the int8 weight-only matmul (ops/quantized_matmul.py).

Decode streams every projection once per step, so the quantized matmul's
HBM efficiency bounds the int8-weight decode rate (BASELINE round-4:
int8 weights measured 5.92 ms/token vs the ~4.4 ms byte-budget floor at
the 8-layer config — this sweep asks how much of that gap is tile
geometry). Measures GB/s of int8 weight bytes streamed for decode-shaped
(T=8) and prefill-shaped (T=256) activations across BLOCK_K x BLOCK_N,
interleaved reps (run-to-run variance rule, CLAUDE.md).

Usage: python benchmarks/qmm_sweep.py  (on the TPU)
"""

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_cute_tpu.ops import quantized_matmul as qm


def time_config(x, qw, bk, bn, reps=30):
    qm.BLOCK_K, qm.BLOCK_N = bk, bn
    f = jax.jit(lambda x: qm._qmm_pallas(x, qw, interpret=False))
    y = f(x)
    float(jnp.ravel(y)[0])  # compile + warm
    # Chain many calls per timing sample so tunnel dispatch amortizes.
    def chain(n):
        t0 = time.perf_counter()
        outs = [f(x) for _ in range(n)]
        float(jnp.ravel(outs[-1])[0])
        return time.perf_counter() - t0
    chain(3)
    t1 = min(chain(10) for _ in range(3))
    t2 = min(chain(10 + reps) for _ in range(3))
    return max((t2 - t1) / reps, 1e-9)


def main():
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    K = N = 4096
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    shapes = {"decode_T8": 8, "prefill_T256": 256}
    grids = [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
             (2048, 512), (512, 2048), (4096, 512), (4096, 1024)]
    results = {}
    for rep in range(2):  # interleave whole sweep twice
        for name, t in shapes.items():
            x = jnp.asarray(rng.standard_normal((t, K)), jnp.bfloat16)
            for bk, bn in grids:
                if bk > K or bn > N:
                    continue
                qw = qm.quantize_weight(w)  # re-pad under current blocks
                dt = time_config(x, qw, bk, bn)
                gbs = K * N / dt / 1e9  # int8 weight bytes per call
                results.setdefault((name, bk, bn), []).append(gbs)
                print(f"[{rep}] {name} bk={bk:5d} bn={bn:5d} "
                      f"{dt*1e3:7.3f} ms  {gbs:6.1f} GB/s weights")
    print("\nbest per shape:")
    for name in shapes:
        rows = {k: max(v) for k, v in results.items() if k[0] == name}
        best = max(rows, key=rows.get)
        print(f"  {name}: bk={best[1]} bn={best[2]} {rows[best]:.1f} GB/s")


if __name__ == "__main__":
    main()
