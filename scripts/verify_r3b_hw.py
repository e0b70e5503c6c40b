"""Hardware verification of the round-3b additions (run on real TPU).

Interpret mode hides block-geometry/DMA bugs (CLAUDE.md), so each new
composition gets a small REAL-hardware exactness/parity check:
  1. Gemma2-style forward (alternating windows, GeGLU, sandwich norms,
     softcaps, D=256): hardware vs interpret logits.
  2. Engine-level speculative serving (model-draft + prompt-lookup):
     exact vs the plain engine ON HARDWARE.
  3. Automatic prefix caching: exact + hit accounting on hardware.
  4. Multi-LoRA serving: merged-dense oracle on hardware.
  5. Beam search: hardware vs interpret token parity.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_r3b_hw.py
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

FAILURES = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'} {name} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    import os

    rehearsal = os.environ.get("FACT_R3B_CPU_REHEARSAL") == "1"
    interp = True if rehearsal else None  # hardware: engine defaults
    if not rehearsal:
        assert jax.devices()[0].platform == "tpu", jax.devices()
    from flash_attention_cute_tpu.models import forward, init_params
    from flash_attention_cute_tpu.models.config import tiny_test_config

    # Small-but-hardware-shaped config (D=256 exercises the Gemma head
    # dim; lanes at 256 = 2x128).
    g_cfg = tiny_test_config(
        num_layers=2, hidden_size=256, intermediate_size=512,
        num_q_heads=4, num_kv_heads=2, head_dim=256,
        dtype=jnp.bfloat16,
        layer_window_pattern=(64, None), sandwich_norms=True,
        hidden_activation="gelu_tanh", logit_softcap=50.0,
        final_logit_softcap=30.0, scale_embeddings=True,
        attention_scale=24.0 ** -0.5,
    )
    g_params = init_params(g_cfg, jax.random.key(0))
    ids = jax.random.randint(jax.random.key(1), (2, 192), 0,
                             g_cfg.vocab_size)
    hw, _ = forward(g_params, g_cfg, ids, mode="prefill",
                    interpret=interp)
    it, _ = forward(g_params, g_cfg, ids, mode="prefill", interpret=True)
    err = float(jnp.abs(hw - it).max())
    check("gemma2_forward_hw_vs_interpret", err < 3e-2, f"err={err:.2e}")

    # Serving compositions on hardware: plain vs speculative vs lookup vs
    # prefix cache vs LoRA, tiny Llama-shaped model.
    from flash_attention_cute_tpu.models.lora import (
        init_lora_params,
        merge_lora,
    )
    from flash_attention_cute_tpu.runtime.engine import ServingEngine
    from flash_attention_cute_tpu.runtime.spec_engine import (
        SpeculativeServingEngine,
    )

    cfg = tiny_test_config(num_layers=2, dtype=jnp.bfloat16)
    params = init_params(cfg, jax.random.key(2))
    dcfg = tiny_test_config(num_layers=1, hidden_size=32,
                            intermediate_size=64, dtype=jnp.bfloat16)
    dparams = init_params(dcfg, jax.random.key(3))
    rng = np.random.default_rng(4)
    system = rng.integers(0, cfg.vocab_size, 17).tolist()
    prompts = {
        i: system + rng.integers(0, cfg.vocab_size, 4 + i).tolist()
        for i in range(3)
    }
    pool = dict(slots=2, num_pages=65, page_size=8, pages_per_seq=16,
                interpret=interp)

    def run(eng, **sub):
        for rid, p in prompts.items():
            eng.submit(rid, p, 6, **sub)
        return eng.run()

    want = run(ServingEngine(params, cfg, **pool))

    spec = run(SpeculativeServingEngine(
        params, cfg, draft_params=dparams, draft_cfg=dcfg, gamma=3,
        rounds_per_call=2, **pool,
    ))
    lookup = run(SpeculativeServingEngine(params, cfg, ngram=2, gamma=3,
                                          **pool))
    # Same verify-kernel path on both sides: tie-robust exactness.
    check("spec_vs_lookup_same_path_exact", spec == lookup)
    # vs the plain engine: decode kernel vs extend kernel can flip
    # bf16 argmax near-ties on random weights (pallas-pitfalls); report
    # the agreement so a mismatch reads as numerics, not logic.
    agree = np.mean([
        spec[r] == want[r] for r in want
    ])
    check("spec_engine_hw_vs_plain_tie_sensitive", agree == 1.0,
          f"request-agreement={agree:.2f}")

    eng = ServingEngine(params, cfg, enable_prefix_cache=True, **pool)
    got = run(eng)
    check("prefix_cache_hw_exact", got == want,
          f"hit_tokens={eng.stats['prefix_hit_tokens']}")
    check("prefix_cache_hw_hits", eng.stats["prefix_hit_tokens"] >= 16)

    lora = init_lora_params(cfg, num_adapters=2, rank=4,
                            key=jax.random.key(5), scaling=0.5)
    qb = lora["layers"]["q_proj"]["b"]
    nb = jax.random.normal(jax.random.key(6), qb[:, 1].shape) * 0.05
    lora["layers"]["q_proj"]["b"] = qb.at[:, 1].set(nb.astype(qb.dtype))
    # Adapter 0 is the zero-B no-op: adding an exact 0 delta must be
    # BITWISE identical to the plain engine (tie-robust even in bf16).
    got0 = run(ServingEngine(params, cfg, lora_params=lora, **pool),
               adapter=0)
    check("lora_hw_noop_adapter_bitwise", got0 == want)
    # A real adapter: logits-level parity vs merged dense weights (token
    # equality is bf16-tie-sensitive — the low-rank delta and the merged
    # matmul round differently).
    lids = jnp.asarray(np.asarray(list(prompts.values())[0])[None, :])
    la, _ = forward(params, cfg, lids, mode="prefill", interpret=interp,
                    lora=lora,
                    adapter_ids=jnp.asarray([1], jnp.int32))
    lb, _ = forward(merge_lora(params, lora, 1), cfg, lids,
                    mode="prefill", interpret=interp)
    lerr = float(jnp.abs(la - lb).max() / (jnp.abs(lb).max() + 1e-9))
    check("lora_hw_logits_vs_merged", lerr < 3e-2, f"rel={lerr:.2e}")

    # Beam search: hardware vs interpret tokens.
    from flash_attention_cute_tpu.runtime.beam_search import beam_generate

    bids = jax.random.randint(jax.random.key(7), (2, 12), 0,
                              cfg.vocab_size)
    hw_seq = beam_generate(params, cfg, bids, 8, num_beams=3,
                           interpret=interp)
    it_seq = beam_generate(params, cfg, bids, 8, num_beams=3,
                           interpret=True)
    check(
        "beam_hw_vs_interpret",
        np.array_equal(np.asarray(hw_seq), np.asarray(it_seq)),
    )

    print(f"\n{'ALL PASS' if not FAILURES else 'FAILURES: ' + str(FAILURES)}",
          flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
