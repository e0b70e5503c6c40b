"""Speculative-decoding mechanism cost on hardware.

With zero egress there are no trained weights, so draft acceptance on
random weights is meaningless; what IS measurable is the mechanism's
cost structure, from which the speedup at any acceptance rate follows:

  tokens/round = 1 + n_accepted            (n in [0, gamma])
  round time   = t_draft_round + t_verify  (both measured here)
  speedup(a)   = (1 + a*gamma) * t_decode / round_time
                 for per-row acceptance probability ~a per draft token
                 (expected accepted ~ a*(1-a^gamma)/(1-a) exactly).

Measures, on the real chip (width-true Llama-3-8B trimmed to --layers,
draft trimmed to --draft-layers):
  * plain decode ms/token (the baseline the speedup divides by)
  * speculative rounds/s with a SELF-draft (acceptance == 100%: the
    max-tokens/s bound of the mechanism at this gamma)
  * speculative rounds/s with the trimmed draft (mechanism cost with a
    realistically-sized draft; acceptance printed for reference only)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/spec_decode_bench.py
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--draft-layers", type=int, default=1)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--gamma", type=int, default=4)
    a = ap.parse_args()

    from flash_attention_cute_tpu.models.presets import get_preset
    from flash_attention_cute_tpu.models.transformer import init_params
    from flash_attention_cute_tpu.runtime.generate import greedy_generate
    from flash_attention_cute_tpu.runtime.speculative import (
        speculative_generate,
    )
    import dataclasses

    print(f"backend: {jax.devices()[0].platform}", flush=True)
    base = get_preset("llama3-8b")
    cfg = dataclasses.replace(base, num_layers=a.layers)
    dcfg = dataclasses.replace(base, num_layers=a.draft_layers)
    params = init_params(cfg, jax.random.key(0))
    dparams = init_params(dcfg, jax.random.key(1))
    ids = jax.random.randint(
        jax.random.key(2), (a.batch, a.prompt), 0, cfg.vocab_size
    )

    import numpy as np

    def fetch(r):
        # block_until_ready does NOT block over the axon tunnel; a real
        # device->host transfer does. Pull every array leaf.
        return jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "block_until_ready")
            else x, r)

    def timed(fn, warm=1, iters=3):
        for _ in range(warm):
            r = fetch(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fetch(fn())
        return (time.perf_counter() - t0) / iters, r

    t_plain, _ = timed(
        lambda: greedy_generate(params, cfg, ids, a.new)
    )
    ms_tok = t_plain / a.new / a.batch * 1e3
    print(f"plain greedy: {t_plain*1e3:.1f} ms total, "
          f"{ms_tok:.3f} ms/token/seq "
          f"({a.batch*a.new/t_plain:.0f} tok/s)", flush=True)

    for name, dp, dc in [("self-draft", params, cfg),
                         (f"draft-{a.draft_layers}L", dparams, dcfg)]:
        t_spec, out = timed(
            lambda dp=dp, dc=dc: speculative_generate(
                params, cfg, dp, dc, ids, a.new, gamma=a.gamma,
                return_stats=True,
            )
        )
        tokens, stats = out
        rounds = max(stats["rounds"], 1)
        acc = stats["accepted_drafts"] / (rounds * a.gamma * a.batch)
        print(
            f"speculative[{name}] gamma={a.gamma}: {t_spec*1e3:.1f} ms, "
            f"{rounds} rounds ({t_spec/rounds*1e3:.2f} ms/round), "
            f"acceptance {acc:.0%}, "
            f"{a.batch*a.new/t_spec:.0f} tok/s", flush=True)
    # Cross-over: speedup(a) = (1 + E_acc(a)) * t_decode_step / t_round.
    print("done", flush=True)


if __name__ == "__main__":
    main()
