#!/bin/bash
# One-shot round-3 hardware measurement runbook. Run when the axon
# tunnel is up:  bash scripts/round3_hw_runbook.sh [outdir]
# Each step appends to $OUT/<name>.log; steps are independent — rerun
# any that fail.
set -u
OUT=${1:-/tmp/r3hw}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
# Persist compiled programs across runbook steps (first compile of a
# config is 20-40 s over the tunnel; the cache makes reruns near-free).
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
cd /root/repo

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "--- $name exit=$? tail:"; tail -5 "$OUT/$name.log"
}

# Ordered by importance-per-minute in case the tunnel window is short:
# headline + correctness first, then perf experiments, then serving.
run smoke        300 python scripts_tpu_smoke.py
run bench        900 python bench.py
run verify_r3    900 python scripts/verify_r3_hw.py
run verify_r3b   900 python scripts/verify_r3b_hw.py
run flatgrid     900 python benchmarks/experiment_flatgrid.py
run qmajor       900 python benchmarks/experiment_qmajor.py
run int8_head    900 python benchmarks/int8_headline.py
run headline_sweep 1800 python benchmarks/headline_sweep.py
run serving_g4   1800 python scripts/benchmark_serving.py --decode-chunk 64 --prefill-group 4
run serving_g4c32 1800 python scripts/benchmark_serving.py --decode-chunk 32 --prefill-group 4
run qwen2_llm    1800 python scripts/benchmark_llm.py --model qwen2-7b --num-layers 4
run qwen2_serve  1800 python scripts/benchmark_serving.py --model qwen2-7b --decode-chunk 64 --prefill-group 4
run gemma2_llm   1800 python scripts/benchmark_llm.py --model gemma2-9b --num-layers 4
run bwd_timing   1800 python benchmarks/bwd_timing.py
run spec_bench   1800 python benchmarks/spec_decode_bench.py
# Engine-level speculative serving: 'self' = acceptance-1.0 mechanism
# ceiling; 'trim' = realistic draft cost structure (acceptance is
# meaningless with random weights).
run spec_serve_self 1800 python scripts/benchmark_serving.py --speculative self --spec-gamma 4 --spec-rounds 4 --prefill-group 4
run prefix_serve 1800 python scripts/benchmark_serving.py --prefix-cache --shared-prefix 256 --decode-chunk 64 --prefill-group 4
run prefix_serve_base 1800 python scripts/benchmark_serving.py --shared-prefix 256 --decode-chunk 64 --prefill-group 4
run spec_serve_trim 1800 python scripts/benchmark_serving.py --speculative trim --draft-layers 1 --spec-gamma 4 --spec-rounds 4 --prefill-group 4
run spec_serve_ngram 1800 python scripts/benchmark_serving.py --speculative ngram --spec-gamma 4 --spec-rounds 4 --prefill-group 4
echo "ALL DONE -> $OUT"
