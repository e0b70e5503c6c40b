#!/bin/bash
# Round-4d hardware runbook: compose the two int8 levers and push to
# full model depth on one chip.
#   decode_int8w_int8kv — int8 weights x int8 KV at the BASELINE decode
#                  config (8-layer 8B-width, B8 S1024). Byte budget per
#                  step: bf16 = proj 1.65G + lm_head 1.05G + KV 1.9G;
#                  both levers together halve ALL of it.
#   fulldepth_decode — the capability unlock: full 32-layer Llama-3-8B
#                  width+depth on a single 16 GB v5e. The bf16 image is
#                  ~16 GB (never fit); int8 weights (~4.9 GB incl.
#                  lm_head) + int8 KV (~3.9 GB at B8 S1152) do.
#                  --init-host quantizes on the host so the dense image
#                  never touches HBM.
#   fulldepth_serve — the serving engine at full depth (int8 weights +
#                  int8 KV pages, 128-token pages).
# Run: bash scripts/round4d_hw_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/r4dhw}
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

run decode_int8w_int8kv 2400 python scripts/benchmark_llm.py --model llama3-8b --num-layers 8 --batch 8 --prompt-len 1024 --max-new-tokens 128 --quantize-weights --cache-dtype int8
run fulldepth_decode 3600 python scripts/benchmark_llm.py --model llama3-8b --batch 8 --prompt-len 1024 --max-new-tokens 128 --quantize-weights --init-host --cache-dtype int8
run fulldepth_serve 5400 python scripts/benchmark_serving.py --quantize-weights --init-host --kv-dtype int8 --num-layers 32 --decode-chunk 64 --prefill-group 4
echo "ALL DONE -> $OUT"
