#!/bin/bash
# Round-4e hardware runbook: prefix-cache serving re-measure after the
# partial-clone fold-in (forward_paged partial_copy=) — round-4c showed
# 19 dispatches / 254 tok/s at shared-prefix 256 vs 6 / 602 without the
# cache, dominated by per-slot clone dispatches and ungrouped suffix
# admissions. The fold-in removes the clone dispatches entirely.
#   prefix_serve         — page-aligned shared prefix (256 = 2 pages)
#   prefix_serve_partial — partial tail page (300 = 2 pages + 44 rows)
#   spec_prefix          — speculative x prefix cache (draft-pool clone
#                          folded into the draft-mirror extend)
# Run: bash scripts/round4e_hw_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/r4ehw}
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
run spec_prefix 5400 python scripts/benchmark_serving.py --speculative self --spec-gamma 4 --spec-rounds 4 --prefill-group 4 --prefix-cache --shared-prefix 300
echo "ALL DONE -> $OUT"
