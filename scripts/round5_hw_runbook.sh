#!/bin/bash
# Round-5 hardware runbook, importance-per-minute order:
#  1. smoke — tunnel + base paths alive.
#  2. verify_quantized_weights_hw — the r4g runbook died in Mosaic
#     lowering on the int4 scale-plane blockspec; this verifies the fix
#     (scales padded to 8 sublane rows per K block) on real hardware.
#  3. bench.py — headline JSON line (driver parity check).
#  4. qmm_sweep — int8/int4 weight-streaming GB/s across tile geometry
#     with time_chained (the r4f sweep's Python-loop timing collapsed);
#     attribution for the ~52%-of-floor per-layer int8 decode rate.
#  5. decode ladder: int4 weights at the BASELINE decode config.
#  6. int8 QK^T retest at S=4096 (queued since round 3b: negative at
#     S=1024, scores dominate at longer S).
#  7. full-depth Llama-3-8B with int4 weights + int8 KV (capacity
#     headline) + the saved-image restore path.
# Run: bash scripts/round5_hw_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/r5hw}
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
run verify_r5 2400 python scripts/verify_r5_hw.py
run verify_qw 3600 python scripts/verify_quantized_weights_hw.py
run bench 1800 python bench.py
run qmm_sweep 5400 python benchmarks/qmm_sweep.py
run decode_int4w 3600 python scripts/benchmark_llm.py --model llama3-8b \
    --num-layers 8 --batch 8 --prompt-len 1024 --max-new-tokens 128 \
    --quantize-weights --weight-bits 4
run int8_qk_s4096 3600 python benchmarks/int8_headline.py 4096 4
run fulldepth_int4 7200 python scripts/benchmark_llm.py --model llama3-8b \
    --batch 8 --prompt-len 1024 --max-new-tokens 128 \
    --quantize-weights --weight-bits 4 --init-host --cache-dtype int8 \
    --save-params /tmp/ckpt_fd_int4
run fulldepth_int4_restore 2400 python scripts/benchmark_llm.py \
    --model llama3-8b --batch 8 --prompt-len 1024 --max-new-tokens 32 \
    --load-params /tmp/ckpt_fd_int4 --cache-dtype int8 --trials 1
echo "ALL DONE -> $OUT"
