#!/bin/bash
# Round-4g hardware runbook: int4 grouped weight quantization.
#  1. TPU smoke (the verify-skill happy path) — the int4 diff touches
#     layers.dense dispatch, so the base paths must still run.
#  2. verify_quantized_weights_hw.py — now covers the int4 kernel
#     (pallas vs dequant oracle, hw vs interpret, pallas vs xla impl,
#     tiny-model forward + greedy parity).
#  3. Decode ladder row: int4 weights at the BASELINE decode config
#     (8-layer 8B-width, B8 S1024) vs the recorded bf16/int8 rows.
#  4. Full-depth Llama-3-8B decode with int4 weights + int8 KV
#     (capacity headline: ~4.3 GB of projection weights).
# Run: bash scripts/round4g_hw_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/r4ghw}
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
run verify_qw 2400 python scripts/verify_quantized_weights_hw.py
run decode_int4w 3600 python scripts/benchmark_llm.py --model llama3-8b \
    --num-layers 8 --batch 8 --prompt-len 1024 --max-new-tokens 128 \
    --quantize-weights --weight-bits 4
run fulldepth_int4 5400 python scripts/benchmark_llm.py --model llama3-8b \
    --batch 8 --prompt-len 1024 --max-new-tokens 128 \
    --quantize-weights --weight-bits 4 --init-host --cache-dtype int8 \
    --save-params /tmp/ckpt_fd_int4
#  5. Checkpoint restore path at full depth on hardware: the saved int4
#     image restores + uploads in seconds (vs ~18 min init+quantize) and
#     decodes identically.
run fulldepth_int4_restore 2400 python scripts/benchmark_llm.py \
    --model llama3-8b --batch 8 --prompt-len 1024 --max-new-tokens 32 \
    --load-params /tmp/ckpt_fd_int4 --cache-dtype int8 --trials 1
echo "ALL DONE -> $OUT"
