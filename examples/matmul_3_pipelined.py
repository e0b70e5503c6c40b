"""Pallas matmul ladder, step 3: the memory/compute pipeline, measured.

TPU-native analog of the reference's two-stage and multistage pipelines
(reference: examples/sgemm_sm70_twostage.cu:158-232 — LDG/STS/LDS/MMA
overlap diagrams; examples/sgemm_sm80_multistage.cu:183-270 — cp.async
kStages=4). On GPU those pipelines are the programmer's job: issue async
copies N stages ahead, place barriers, double-buffer registers. On TPU,
**Pallas' grid pipeline does this automatically**: for a sequential grid
dimension it issues the next block's HBM->VMEM DMA while the current
block computes (exactly the cp.async prefetch loop of the reference's FA
kernel, csrc/flash_attention_template.cuh:323-385).

What remains the programmer's job is choosing BLOCK SIZES so the pipeline
can actually hide memory latency. This example measures it:

  * arithmetic intensity of a (bm, bn, bk) step = work / traffic
    = (2*bm*bn*bk) / (bm*bk + bk*bn bytes-ish) — bigger tiles amortize;
  * too-big tiles blow VMEM (16 MB) or leave only one buffer (no overlap);
  * the sweet spot on v5e lands near 512x512x(512..2048) for bf16.

It prints a small block-size sweep with TFLOP/s against the chip's bf16
peak, and verifies numerics — the measurement mindset the reference's
examples teach with Nsight timelines.

Run: python examples/matmul_3_pipelined.py [--interpret]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from examples.matmul_2_tiled import matmul
from flash_attention_cute_tpu.utils.timing import time_chained

V5E_BF16_PEAK_TFLOPS = 197.0


def bench_config(a, b, bm, bn, bk):
    def make_chain(n_iters):
        @jax.jit
        def f(a_, b_):
            def body(i, a_carry):
                o = matmul(a_carry, b_, block_m=bm, block_n=bn, block_k=bk)
                # Feed output forward (scaled to stay bounded) — a real
                # data dependency so nothing is elided.
                return (o * (1.0 / o.shape[1])).astype(a_.dtype)

            out = jax.lax.fori_loop(0, n_iters, body, a_)
            return out[0, 0].astype(jnp.float32)

        return f

    return time_chained(make_chain, (a, b), n1=2, n2=10)


def main():
    interpret = "--interpret" in sys.argv
    m = n = k = 4096
    ka, kb = jax.random.split(jax.random.key(0))
    a = jax.random.normal(ka, (m, k), jnp.float32).astype(jnp.bfloat16)
    b = jax.random.normal(kb, (k, n), jnp.float32).astype(jnp.bfloat16)

    # numerics first (small, also works off-TPU / interpret)
    out = matmul(a[:1024, :1024], b[:1024, :1024],
                 block_m=512, block_n=512, block_k=512,
                 interpret=interpret)
    want = jnp.dot(a[:1024, :1024].astype(jnp.float32),
                   b[:1024, :1024].astype(jnp.float32))
    rel = float(jnp.abs(out.astype(jnp.float32) - want).max()
                / jnp.abs(want).max())
    assert rel < 5e-3, rel
    print(f"numerics: rel err {rel:.2e}  PASS")

    if interpret or jax.devices()[0].platform != "tpu":
        print("(no TPU: skipping the sweep)")
        return

    flops = 2 * m * n * k
    print(f"\n{m}x{k}x{n} bf16 sweep (v5e bf16 peak ~{V5E_BF16_PEAK_TFLOPS} TFLOP/s):")
    print(f"{'bm':>5} {'bn':>5} {'bk':>5} {'ms':>9} {'TFLOP/s':>9} {'% peak':>7}")
    for bm, bn, bk in [
        (128, 128, 128),   # small tiles: DMA-bound, pipeline can't hide HBM
        (256, 256, 256),
        (512, 512, 512),   # the sweet spot region
        (512, 512, 1024),
        (512, 1024, 512),
        (1024, 1024, 512),
    ]:
        t = bench_config(a, b, bm, bn, bk)
        tf = flops / t / 1e12
        print(f"{bm:>5} {bn:>5} {bk:>5} {t * 1e3:>9.3f} {tf:>9.1f} "
              f"{100 * tf / V5E_BF16_PEAK_TFLOPS:>6.1f}%")


if __name__ == "__main__":
    main()
