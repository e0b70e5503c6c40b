#!/bin/bash
# Round-4c hardware runbook: int8 weight-only quantization + the
# prefix-cache serving re-measure after the double-warmup fix.
#   verify_qw    — quantized-matmul kernel + model-level hardware checks
#   decode_bf16  — control: same-session re-measure of the BASELINE row
#                  (8-layer 8B-width, B8 S1024: round-2 7.22 ms/token)
#   decode_int8w — the 2x lever: int8 weights halve decode's streamed
#                  bytes (decode runs at 96-99% of the bf16 floor)
#   prefix_serve — was warm-recompiling (wave-1 warmup never compiled the
#                  short-suffix buckets a warm cache admits); the
#                  double-warmup benchmark fix makes the measured wave
#                  steady-state
#   serve_int8w  — serving engine with int8 weights
# Run: bash scripts/round4c_hw_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/r4chw}
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

run verify_qw    1800 python scripts/verify_quantized_weights_hw.py
run decode_bf16  1800 python scripts/benchmark_llm.py --model llama3-8b --num-layers 8 --batch 8 --prompt-len 1024 --max-new-tokens 128
run decode_int8w 2400 python scripts/benchmark_llm.py --model llama3-8b --num-layers 8 --batch 8 --prompt-len 1024 --max-new-tokens 128 --quantize-weights
run prefix_serve 5400 python scripts/benchmark_serving.py --prefix-cache --shared-prefix 256 --decode-chunk 64 --prefill-group 4
run prefix_serve_partial 5400 python scripts/benchmark_serving.py --prefix-cache --shared-prefix 300 --decode-chunk 64 --prefill-group 4
run serve_int8w  3600 python scripts/benchmark_serving.py --quantize-weights --decode-chunk 64 --prefill-group 4
echo "ALL DONE -> $OUT"
