#!/bin/bash
# Round-5b hardware runbook — re-measures after the round-5 qmm tile
# retune (BLOCK_N 512 -> 2048; sweep showed 512x512 was the worst decode
# config: int8 520-540 GB/s vs 730-745 at 512x2048) plus the repaired
# int8-QK^T S=4096 retest (the r5 run OOMed in the fp32 oracle, not the
# kernel — the oracle now checks one head-group slice).
#  1. decode ladder at the BASELINE config: int8 and int4 weights with
#     the new tiles (old-tile rows: int8 5.923, int4 5.812 ms/token).
#  2. int8 QK^T at S=4096 (queued since round 3b).
#  3. min-p + penalties hardware drive (round-5 serving features).
# Run: bash scripts/round5b_hw_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/r5bhw}
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

run verify_r5b 2400 python scripts/verify_r5b_hw.py
run decode_int8w_retune 3600 python scripts/benchmark_llm.py \
    --model llama3-8b --num-layers 8 --batch 8 --prompt-len 1024 \
    --max-new-tokens 128 --quantize-weights
run decode_int4w_retune 3600 python scripts/benchmark_llm.py \
    --model llama3-8b --num-layers 8 --batch 8 --prompt-len 1024 \
    --max-new-tokens 128 --quantize-weights --weight-bits 4
# Projection fusion (models/fuse.py, 7 -> 4 weight streams/launches per
# layer) was never hardware-measured; the full-depth attribution says
# per-layer fixed cost is now the dominant decode overhead.
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
run fulldepth_int4_fused 7200 python scripts/benchmark_llm.py \
    --model llama3-8b --batch 8 --prompt-len 1024 --max-new-tokens 128 \
    --quantize-weights --weight-bits 4 --init-host --cache-dtype int8 \
    --fuse-projections
echo "ALL DONE -> $OUT"
