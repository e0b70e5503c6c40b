#!/bin/bash
# Probe the axon tunnel every 3 min; when a tiny matmul completes,
# launch the round-5 hardware runbook once, persist logs, and exit.
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
    echo "tunnel up — launching round-5 runbook"
    bash scripts/round5_hw_runbook.sh /tmp/r5hw
    touch /tmp/r5hw/RUNBOOK_DONE
    mkdir -p /root/repo/benchmarks/r5hw_logs
    cp /tmp/r5hw/*.log /root/repo/benchmarks/r5hw_logs/ 2>/dev/null
    exit 0
  fi
  echo "tunnel still down; sleeping 180s"
  sleep 180
done
