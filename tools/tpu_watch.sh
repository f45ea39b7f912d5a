#!/bin/bash
# Poll the axon TPU backend until it answers, logging each attempt.
# Writes "OK <timestamp>" to /tmp/tpu_status on success and exits.
# Single-flight: bench.py --_probe is the one TPU client while this runs;
# kill $(cat /tmp/tpu_watch.pid) before launching real TPU work.
echo $$ > /tmp/tpu_watch.pid
while true; do
  if timeout -k 30 420 python /root/repo/bench.py --_probe >> /tmp/tpu_watch.log 2>&1; then
    echo "OK $(date +%s)" > /tmp/tpu_status
    echo "[tpu_watch] backend recovered $(date -u)" >> /tmp/tpu_watch.log
    exit 0
  fi
  echo "DOWN $(date +%s)" > /tmp/tpu_status
  echo "[tpu_watch] still down $(date -u)" >> /tmp/tpu_watch.log
  sleep 120
done
