#!/bin/bash
# Poll the TPU tunnel with short-lived bounded probes; exit 0 the moment a
# probe completes a real device op. Never holds the device between probes
# (each probe is its own subprocess — CLAUDE.md: one process holds the TPU).
# Usage: tools/tunnel_wait.sh [max_seconds] [probe_interval_seconds]
set -u
MAX=${1:-10800}
IVL=${2:-240}
T0=$(date +%s)
while true; do
  if timeout 90 python -u - <<'EOF' >/dev/null 2>&1
import jax  # sitecustomize pre-imports with JAX_PLATFORMS=axon
import numpy as np, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((8, 128), jnp.bfloat16)
np.asarray(x @ x.T)  # fetch fences: proves the tunnel round-trips
EOF
  then
    echo "TUNNEL UP at $(date -u +%H:%M:%S)"
    exit 0
  fi
  NOW=$(date +%s)
  if [ $((NOW - T0)) -ge "$MAX" ]; then
    echo "TUNNEL STILL DOWN after ${MAX}s"
    exit 1
  fi
  sleep "$IVL"
done
