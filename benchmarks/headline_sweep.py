"""One-shot bf16 headline sweep (the ≥85 TF/s hunt, tunnel-efficient).

Interleaves every promising production-kernel configuration (block
size x inner splits x diag_fused_subs) with the q-major repack variants
at the headline shape, 3 repetitions each (run-to-run variance on the
tunneled chip is ±5-10%), and prints a sorted leaderboard. Every config
is parity-checked against the fp32 oracle before timing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/headline_sweep.py
"""
from __future__ import annotations

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.ops.flash_fwd import flash_attention_fwd
from flash_attention_cute_tpu.ops.reference import attention_reference
from flash_attention_cute_tpu.utils.timing import chain_attention, time_chained

PEAK = 197e12


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    B, HQ, HKV, S, D = 16, 64, 8, 1024, 128
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
    fl = 4 * B * HQ * S * S * D / 2
    r = attention_reference(q, k, v, causal=True)

    configs = [("prod_default", functools.partial(
        flash_attention_fwd, causal=True))]
    # Production diag-first kernel tuning grid. block_q == block_kv keeps
    # the diag route; fused_subs sweeps the hybrid split.
    for block in (256, 384, 512):
        for inner in (2, 4, 8):
            if block % inner or block // inner < 8:
                continue
            for fsub in (1, 2, 4):
                if fsub > inner:
                    continue
                configs.append((
                    f"b{block}_i{inner}_f{fsub}",
                    functools.partial(
                        flash_attention_fwd, causal=True,
                        block_q=block, block_kv=block,
                        inner_splits=inner, diag_fused_subs=fsub,
                    ),
                ))
    try:
        from benchmarks.experiment_qmajor import qmajor_attention

        for block in (256, 512):
            for inner in (2, 4):
                for fsub in (1, 2):
                    if fsub > inner:
                        continue
                    configs.append((
                        f"qmaj_b{block}_i{inner}_f{fsub}",
                        functools.partial(
                            qmajor_attention, block=block, inner=inner,
                            fused_subs=fsub,
                        ),
                    ))
    except Exception as e:  # pragma: no cover
        print(f"qmajor unavailable: {e}", flush=True)

    results: dict[str, list[float]] = {}
    for rep in range(3):
        for name, fn in configs:
            try:
                o = fn(q, k, v)
                err = float(jnp.abs(o.astype(jnp.float32)
                                    - r.astype(jnp.float32)).max())
                assert err < 3e-2, (name, err)
                t = time_chained(
                    functools.partial(chain_attention, fn, out_dtype=q.dtype),
                    (q, k, v), n1=10, n2=50,
                )
                tf = fl / t / 1e12
                results.setdefault(name, []).append(tf)
                print(f"[{rep}] {name:18s} {tf:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"[{rep}] {name}: {type(e).__name__}: {str(e)[:120]}",
                      flush=True)

    print("\n=== leaderboard (median of reps) ===", flush=True)
    board = sorted(
        ((sorted(v)[len(v) // 2], n) for n, v in results.items()),
        reverse=True,
    )
    for tf, name in board:
        print(f"{name:18s} {tf:6.1f} TF/s ({tf/PEAK*1e12*100:4.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
