#!/bin/bash
# Probe the axon tunnel every 3 min; when a tiny matmul completes,
# launch the round-5b runbook once, persist logs, and exit.
# (The first r5b attempt hit a tunnel wedge mid decode_int8w_retune —
# a trivial jnp matmul from a fresh process hung, the round-3 outage
# signature.)
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
cd /root/repo
while true; do
  date
  if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print('TPU OK', float((x@x).sum()))
"; then
    echo "tunnel up — launching round-5b runbook"
    bash scripts/round5b_hw_runbook.sh benchmarks/r5bhw_logs
    touch benchmarks/r5bhw_logs/RUNBOOK_DONE
    exit 0
  fi
  echo "tunnel still down; sleeping 180s"
  sleep 180
done
