#!/bin/bash
# Probe the axon tunnel every 3 min; when a tiny matmul completes,
# launch the round-3 hardware runbook once and exit.
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
    echo "tunnel up — launching runbook"
    bash scripts/round3_hw_runbook.sh /tmp/r3hw
    touch /tmp/r3hw/RUNBOOK_DONE
    # Persist the measurement logs into the repo so they survive the
    # session even if nobody is around to read /tmp.
    mkdir -p /root/repo/benchmarks/r3hw_logs
    cp /tmp/r3hw/*.log /root/repo/benchmarks/r3hw_logs/ 2>/dev/null
    exit 0
  fi
  echo "tunnel still down; sleeping 180s"
  sleep 180
done
