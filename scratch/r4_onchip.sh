#!/bin/bash
# Round-4 on-chip queue: poll for tunnel recovery, then run whatever is
# queued in the SECTIONS list below. Each step in its own process+timeout
# (a mid-run tunnel relapse must not kill the queue; the loop re-probes
# between steps). Log: /tmp/r4_onchip.log
set -u
cd /root/repo
LOG=/tmp/r4_onchip.log
: > "$LOG"

probe() {
  timeout 90 python -c "
import jax
assert jax.default_backend() == 'tpu'
print(float(jax.numpy.sum(jax.numpy.ones((8,128)))), flush=True)
" >> /dev/null 2>&1
}

wait_tpu() {
  for i in $(seq 1 300); do
    probe && return 0
    sleep 60
  done
  return 1
}

run_step() {  # name, timeout_s, cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  if ! wait_tpu; then echo "TPU never recovered; abort" >> "$LOG"; exit 1; fi
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "=== $name exit: $? ($(date -u +%H:%M:%S)) ===" >> "$LOG"
}

run_step drive   700 python /tmp/drive.py
run_step body_ab 900 python scratch/r4_body_ab.py
run_step ordered_ab 1200 python scratch/r4_ordered_ab.py
echo "ALL_DONE ($(date -u +%H:%M:%S))" >> "$LOG"
