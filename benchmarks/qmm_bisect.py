"""Bisect the int8 qmm Mosaic compile at round-5 tiles, shape by shape.

Both round-5b wedges happened while scripts/benchmark_llm.py
--quantize-weights (int8) was compiling at the retuned BLOCK_N=2048 —
the int4 variant and the 4096x4096 sweep shapes compiled fine, so the
suspects are the model widths the sweep never compiled: 14336 (FFN) and
the padded 129024 lm_head. Each shape runs in its own subprocess with a
timeout so a hanging compile is reported, not inherited.

Usage: python benchmarks/qmm_bisect.py [timeout_s per shape]
"""

import pathlib
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

SHAPES = [  # (T, K, N)
    (8, 4096, 4096),
    (8, 4096, 1024),
    (8, 4096, 14336),
    (8, 14336, 4096),
    (8, 4096, 129024),
    (1024, 4096, 4096),    # prefill-shaped rows
    (1024, 4096, 14336),
]

SNIPPET = """
import jax, jax.numpy as jnp, numpy as np
from flash_attention_cute_tpu.ops import quantized_matmul as qm
t, k, n = {t}, {k}, {n}
rng = np.random.default_rng(0)
w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32)
x = jnp.asarray(rng.standard_normal((t, k)), jnp.bfloat16)
qw = qm.quantize_weight(w)
y = qm.quantized_matmul(x, qw)
y.block_until_ready()
print("OK", y.shape, float(jnp.abs(y).max()))
"""


def main():
    to = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    for t, k, n in SHAPES:
        code = SNIPPET.format(t=t, k=k, n=n)
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=to,
                capture_output=True, text=True, cwd=REPO,
            )
            tail = (r.stdout + r.stderr).strip().splitlines()[-1:]
            print(f"int8 T{t} {k}x{n}: rc={r.returncode} {tail}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"int8 T{t} {k}x{n}: TIMEOUT after {to}s  <-- suspect",
                  flush=True)


if __name__ == "__main__":
    main()
