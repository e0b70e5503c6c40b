#!/bin/bash
# Round-4b hardware runbook: the round-4 steps that failed or were cut.
#   verify_r3   — clean run of the (fixed) round-3 verify script
#   prefix_serve — was VMEM-OOM in the packed 4096-row paged-extend; the
#                  chunk-axis split fix landed (fc5867d). Warmup compiles
#                  run ~15-20 min at this config (the 4096-row extend
#                  alone compiled ~8 min) — hence the long timeouts.
#   prefix_serve_partial — shared prefix 300 = 2 full 128-pages + 44 tail
#                  rows: exercises partial-page (copy-on-admit) sharing
#                  in the serving loop on hardware.
#   spec_serve_self — truncated twice by tunnel outages; re-run.
# Run: bash scripts/round4b_hw_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/r4bhw}
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

run verify_r3     1800 python scripts/verify_r3_hw.py
run prefix_serve  3600 python scripts/benchmark_serving.py --prefix-cache --shared-prefix 256 --decode-chunk 64 --prefill-group 4
run prefix_serve_partial 3600 python scripts/benchmark_serving.py --prefix-cache --shared-prefix 300 --decode-chunk 64 --prefill-group 4
run spec_serve_self 3600 python scripts/benchmark_serving.py --speculative self --spec-gamma 4 --spec-rounds 4 --prefill-group 4
echo "ALL DONE -> $OUT"
