"""Head-of-line-blocking benchmark: chunked admission vs whole-prompt.

A short request arrives together with several LONG prompts. With
whole-prompt admission the short request's first tokens wait behind the
long prefills; with chunked admission (prefill_chunk) the long prompts
admit in chunks interleaved with the short request's decode rounds — and
since round 2, ALL admitting slots advance in ONE batched extend forward
per round, so interleaving no longer multiplies dispatch count.

Reports time-to-completion of the short request under both policies.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/hol_bench.py [--layers 4] [--long 2048]
"""

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def run(policy_chunk, cfg, params, long_len, n_long, short_new):
    from flash_attention_cute_tpu.runtime.engine import ServingEngine

    rng = np.random.default_rng(0)
    page_size = 128
    pages_per_seq = (long_len + 256) // page_size + 1
    eng = ServingEngine(
        params, cfg, slots=1 + n_long,
        num_pages=(1 + n_long) * pages_per_seq + 1,
        page_size=page_size, pages_per_seq=pages_per_seq,
        prefill_chunk=policy_chunk,
    )
    short = rng.integers(0, cfg.vocab_size, 8).tolist()
    eng.submit(0, short, short_new)
    for i in range(n_long):
        eng.submit(1 + i, rng.integers(0, cfg.vocab_size, long_len).tolist(), 8)

    # Warm the compiles with a dry run shape-wise identical? Cold compiles
    # dominate otherwise: run once, rebuild, run again and time the second.
    t0 = time.time()
    short_done = None
    for _ in range(100000):
        busy = eng.step()
        if short_done is None and 0 not in eng._requests:
            short_done = time.time() - t0
        if not busy:
            break
    total = time.time() - t0
    assert not eng.failed, eng.failed
    return short_done, total, eng.stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--long", type=int, default=2048)
    ap.add_argument("--n-long", type=int, default=3)
    ap.add_argument("--short-new", type=int, default=32)
    a = ap.parse_args()

    from flash_attention_cute_tpu.models import init_params
    from flash_attention_cute_tpu.models.llama import llama3_8b_config

    cfg = dataclasses.replace(llama3_8b_config(), num_layers=a.layers)
    params = init_params(cfg, jax.random.key(0))
    print(f"model: 8B-width, {a.layers} layers; {a.n_long} x {a.long}-token "
          f"prompts vs one 8-token prompt (+{a.short_new} new)", flush=True)

    for label, chunk in (("whole-prompt", 0), ("chunked-256", 256)):
        # First run pays compiles; second run measures.
        run(chunk, cfg, params, a.long, a.n_long, a.short_new)
        short, total, stats = run(
            chunk, cfg, params, a.long, a.n_long, a.short_new
        )
        print(f"{label:13s} short-request completion {short*1e3:7.0f} ms   "
              f"all done {total*1e3:7.0f} ms   {stats}", flush=True)


if __name__ == "__main__":
    main()
