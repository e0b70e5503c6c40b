#!/bin/bash
# Round-5d hardware runbook — decode re-measurement after this
# session's three decode-path changes:
#   1. biased int4 nibble packing (unpack 6 ops -> 3, +18-35% qmm GB/s)
#   2. lax.map layer-chunked quantize (unblocks fused int4 on-device)
#   3. _kv_write per-row dus cache append (3x cheaper than scatter)
# Prior rows to beat: int4 unfused 4.896 ms/token (r5b retune), int8
# fused 5.315 (r5c), full-depth int4+int8KV 18.214 ms/token (r5).
# Run: bash scripts/round5d_hw_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/r5dhw}
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

run smoke 1200 python scripts_tpu_smoke.py
run decode_int4w_fused 3600 python scripts/benchmark_llm.py \
    --model llama3-8b --num-layers 8 --batch 8 --prompt-len 1024 \
    --max-new-tokens 128 --quantize-weights --weight-bits 4 \
    --fuse-projections
run decode_int4w_biased 3600 python scripts/benchmark_llm.py \
    --model llama3-8b --num-layers 8 --batch 8 --prompt-len 1024 \
    --max-new-tokens 128 --quantize-weights --weight-bits 4
run fulldepth_int4_fused 9000 python scripts/benchmark_llm.py \
    --model llama3-8b --batch 8 --prompt-len 1024 --max-new-tokens 128 \
    --quantize-weights --weight-bits 4 --init-host --cache-dtype int8 \
    --fuse-projections --save-params /tmp/fulldepth_int4_fused_ckpt
echo "ALL DONE -> $OUT"
