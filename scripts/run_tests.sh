#!/bin/bash
# Full CPU test suite, split into two fresh interpreter processes.
# A single long pytest process accumulates thousands of XLA CPU
# compilations and eventually segfaults inside backend_compile (observed
# deterministically at ~55% of the combined suite; every file passes in
# isolation). Two processes keep each comfortably inside the envelope.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/test_[a-m]*.py -q "$@"
python -m pytest tests/test_[n-z]*.py -q "$@"
