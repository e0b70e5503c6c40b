"""Round-5b hardware verification: qmm tile retune, min-p, penalties.

Run on the TPU (PYTHONPATH=/root/repo:/root/.axon_site). Covers:
  1. quantized matmuls (int8 + int4) at the retuned BLOCK_N=2048 tiles
     vs the dequant oracle, including N > 2048 non-multiples (Qwen2's
     3584) and a ragged lm_head-like width.
  2. min-p sampling: filter support vs the probability oracle on TPU,
     and an end-to-end sampled generation whose min_p -> 1 limit must
     equal greedy.
  3. sampling penalties: hardware engine streams (plain + speculative +
     ngram) must match the interpret-mode oracle runs token for token,
     and the spec engines must match the plain engine ON hardware.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

PASS = 0


def ok(name, cond, detail=""):
    global PASS
    tag = "PASS" if cond else "FAIL"
    print(f"{tag} {name} {detail}", flush=True)
    if not cond:
        sys.exit(f"FAILED: {name}")
    PASS += 1


def check_qmm():
    from flash_attention_cute_tpu.ops import quantized_matmul as qm

    rng = np.random.default_rng(0)
    shapes = [  # (T, K, N) — decode row, prefill rows, awkward widths
        (8, 4096, 4096),
        (8, 4096, 14336),
        (8, 3584, 3584),      # Qwen2 width: N pads 3584 -> 4096 at bn 2048
        (8, 4096, 2176),      # non-multiple just above one tile
        (256, 4096, 4096),
        (17, 512, 640),       # ragged small
    ]
    for t, k, n in shapes:
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32)
        x = jnp.asarray(rng.standard_normal((t, k)), jnp.bfloat16)
        for name, quant, deq in (
            ("int8", qm.quantize_weight, qm.dequantize_weight),
            ("int4", qm.quantize_weight_int4, qm.dequantize_weight4),
        ):
            qw = quant(w)
            got = qm.quantized_matmul(x, qw)
            want = jnp.dot(
                x, deq(qw, jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            err = float(jnp.abs(
                got.astype(jnp.float32) - want.astype(jnp.float32)
            ).max())
            scale = float(jnp.abs(want.astype(jnp.float32)).max())
            ok(f"qmm_{name}_{t}x{k}x{n}", err <= 0.03 * max(scale, 1.0),
               f"err={err:.2e} (|want|max={scale:.2f})")


def check_min_p():
    from flash_attention_cute_tpu.models.config import tiny_test_config
    from flash_attention_cute_tpu.models.transformer import init_params
    from flash_attention_cute_tpu.runtime.generate import generate
    from flash_attention_cute_tpu.runtime.sampling import (
        SamplingParams,
        filter_logits,
    )

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((4, 257)) * 3.0, jnp.float32)
    sp = SamplingParams(temperature=0.8, min_p=0.15)
    got = np.asarray(jax.jit(lambda l: filter_logits(l, sp))(logits))
    scaled = np.asarray(logits, np.float64) / 0.8
    p = np.exp(scaled - scaled.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    keep = p >= 0.15 * p.max(-1, keepdims=True)
    ok("min_p_filter_support", (np.isfinite(got) == keep).all(),
       f"kept {int(keep.sum())}/{keep.size}")

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.key(0))
    ids = jax.random.randint(jax.random.key(1), (2, 9), 0, cfg.vocab_size)
    a = np.asarray(generate(
        params, cfg, ids, 8,
        sampling=SamplingParams(temperature=1.0, min_p=0.3),
        key=jax.random.key(7),
    ))
    b = np.asarray(generate(
        params, cfg, ids, 8,
        sampling=SamplingParams(temperature=1.0, min_p=0.3),
        key=jax.random.key(7),
    ))
    ok("min_p_generate_deterministic", (a == b).all())
    g = np.asarray(generate(
        params, cfg, ids, 8, sampling=SamplingParams(temperature=0.0)
    ))
    m = np.asarray(generate(
        params, cfg, ids, 8,
        sampling=SamplingParams(temperature=1.0, min_p=0.9999),
        key=jax.random.key(9),
    ))
    ok("min_p_limit_is_greedy", (g == m).all())


def check_penalties():
    from flash_attention_cute_tpu.models.config import tiny_test_config
    from flash_attention_cute_tpu.models.transformer import init_params
    from flash_attention_cute_tpu.runtime.engine import ServingEngine
    from flash_attention_cute_tpu.runtime.spec_engine import (
        SpeculativeServingEngine,
    )

    cfg = tiny_test_config(num_layers=2)
    params = init_params(cfg, jax.random.key(0))
    dcfg = tiny_test_config(num_layers=1)
    dparams = init_params(dcfg, jax.random.key(9))
    rng = np.random.default_rng(10)
    prompts = {0: rng.integers(0, cfg.vocab_size, 7).tolist(),
               1: rng.integers(0, cfg.vocab_size, 5).tolist()}
    pens = {0: dict(repetition_penalty=1.6, frequency_penalty=0.3),
            1: dict(presence_penalty=0.8)}

    def run(engine_cls, interpret, **kw):
        eng = engine_cls(
            params, cfg, slots=2, num_pages=65, page_size=8,
            pages_per_seq=8, interpret=interpret, **kw,
        )
        for rid, p in prompts.items():
            eng.submit(rid, p, 8, **pens[rid])
        out = eng.run()
        assert not eng.failed, eng.failed
        return out

    plain_hw = run(ServingEngine, None)
    plain_ci = run(ServingEngine, True)
    ok("penalties_plain_hw_vs_interpret", plain_hw == plain_ci,
       f"{plain_hw} vs {plain_ci}")
    spec_hw = run(SpeculativeServingEngine, None,
                  draft_params=dparams, draft_cfg=dcfg, gamma=3)
    ok("penalties_spec_matches_plain_hw", spec_hw == plain_hw)
    ngram_hw = run(SpeculativeServingEngine, None, ngram=2, gamma=3)
    ok("penalties_ngram_matches_plain_hw", ngram_hw == plain_hw)


def main():
    print("devices:", jax.devices(), flush=True)
    check_qmm()
    check_min_p()
    check_penalties()
    print(f"ALL PASS ({PASS} checks)", flush=True)


if __name__ == "__main__":
    main()
