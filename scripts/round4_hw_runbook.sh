#!/bin/bash
# Round-4 hardware runbook: the round-3 runbook steps that were cut off
# when the previous session died (spec/prefix serving rows, qmajor
# timing) plus a clean re-run of the verify scripts at the corrected
# hw-vs-interpret tolerances. Run: bash scripts/round4_hw_runbook.sh [outdir]
set -u
OUT=${1:-/tmp/r4hw}
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

# Importance-per-minute order: verification first, then the serving
# rows the round-3 ledger still lacks, then perf experiments.
run verify_r4     1200 python scripts/verify_r3_hw.py
run prefix_serve  1800 python scripts/benchmark_serving.py --prefix-cache --shared-prefix 256 --decode-chunk 64 --prefill-group 4
run prefix_serve_base 1800 python scripts/benchmark_serving.py --shared-prefix 256 --decode-chunk 64 --prefill-group 4
run spec_serve_self 1800 python scripts/benchmark_serving.py --speculative self --spec-gamma 4 --spec-rounds 4 --prefill-group 4
run spec_serve_trim 1800 python scripts/benchmark_serving.py --speculative trim --draft-layers 1 --spec-gamma 4 --spec-rounds 4 --prefill-group 4
run spec_serve_ngram 1800 python scripts/benchmark_serving.py --speculative ngram --spec-gamma 4 --spec-rounds 4 --prefill-group 4
run qmajor        1800 python benchmarks/experiment_qmajor.py
echo "ALL DONE -> $OUT"
