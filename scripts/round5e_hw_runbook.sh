#!/bin/bash
# Round-5e hardware runbook — full-depth rows with the round-5c/5d
# decode-path changes (biased int4 packing, lax.map quantize, dus cache
# append, projection fusion):
#   1. full-depth Llama-3-8B decode/prefill, int4 fused weights + int8
#      KV (prior row: 18.214 ms/token unfused signed-int4, r5);
#      saves the quantized image for reuse.
#   2. FULL-DEPTH SERVING (never measured at 32 layers): the 4-slot
#      default config restored from that image, int8 KV pages.
# NB: run nothing else against the chip while this is up; the 86 ms
# fused anomaly in r5dhw was a transient from a recovering compile
# service (rerun measured 4.146 ms/token — see BASELINE round-5d).
# Run: bash scripts/round5e_hw_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/r5ehw}
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

run fulldepth_int4_fused 9000 python scripts/benchmark_llm.py \
    --model llama3-8b --batch 8 --prompt-len 1024 --max-new-tokens 128 \
    --quantize-weights --weight-bits 4 --init-host --cache-dtype int8 \
    --fuse-projections --save-params /tmp/fulldepth_int4_fused_ckpt
run fulldepth_serve 7200 python scripts/benchmark_serving.py \
    --load-params /tmp/fulldepth_int4_fused_ckpt --kv-dtype int8 \
    --decode-chunk 64 --prefill-group 4 --min-prompt 512 \
    --max-prompt 1024 --max-new-tokens 128
echo "ALL DONE -> $OUT"
