#!/bin/bash
# Round-4f hardware runbook: prefix-serve re-measure after the
# admission-stagger fix (_sched_admit keeps evicting while free slots
# remain unfilled — round-4e still showed 2-slot sub-waves), plus the
# quantized-matmul tile sweep (how much of the int8 decode gap vs the
# byte-budget floor is tile geometry).
# Run: bash scripts/round4f_hw_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/r4fhw}
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

run prefix_serve 5400 python scripts/benchmark_serving.py --prefix-cache --shared-prefix 256 --decode-chunk 64 --prefill-group 4
run prefix_serve_partial 5400 python scripts/benchmark_serving.py --prefix-cache --shared-prefix 300 --decode-chunk 64 --prefill-group 4
run qmm_sweep 3600 python benchmarks/qmm_sweep.py
echo "ALL DONE -> $OUT"
