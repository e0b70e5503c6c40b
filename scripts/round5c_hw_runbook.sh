#!/bin/bash
# Round-5c hardware runbook — the round-5b tail that never ran (the
# session ended mid-runbook): the projection-fusion decode ladder at
# 8 layers (fuse.py was never hardware-measured; the full-depth
# attribution says per-layer fixed cost is now the dominant decode
# overhead) plus the int8-QK^T S=4096 retest queued since round 3b.
# The full-depth fused run moves to a later runbook so any per-layer
# overhead fixes from benchmarks/layer_overhead.py land first.
# Run: bash scripts/round5c_hw_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/r5chw}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
cd /root/repo

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "--- $name exit=$? tail:"; tail -5 "$OUT/$name.log"
}

run decode_int8w_fused 3600 python scripts/benchmark_llm.py \
    --model llama3-8b --num-layers 8 --batch 8 --prompt-len 1024 \
    --max-new-tokens 128 --quantize-weights --fuse-projections
run decode_int4w_fused 3600 python scripts/benchmark_llm.py \
    --model llama3-8b --num-layers 8 --batch 8 --prompt-len 1024 \
    --max-new-tokens 128 --quantize-weights --weight-bits 4 \
    --fuse-projections
run decode_bf16_fused 3600 python scripts/benchmark_llm.py \
    --model llama3-8b --num-layers 8 --batch 8 --prompt-len 1024 \
    --max-new-tokens 128 --fuse-projections
run int8_qk_s4096 3600 python benchmarks/int8_headline.py 4096 4
echo "ALL DONE -> $OUT"
