#!/bin/bash
# Poll for the TPU tunnel to return. Writes /tmp/tpu_up when a bounded
# device-init probe succeeds, then exits. One probe process at a time
# (CLAUDE.md: one process holds the TPU); each probe is bounded so a hung
# tunnel can't wedge the watcher. Log: /tmp/tpu_watch.log
set -u
rm -f /tmp/tpu_up
while true; do
  ts=$(date -u +%H:%M:%S)
  if timeout 240 python -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu', d; print(d)" >>/tmp/tpu_watch.log 2>&1; then
    echo "$ts TPU UP" >> /tmp/tpu_watch.log
    touch /tmp/tpu_up
    exit 0
  fi
  echo "$ts probe failed/timed out" >> /tmp/tpu_watch.log
  sleep 300
done
