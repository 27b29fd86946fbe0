#!/bin/bash
# Round-4 on-chip queue, part 3: headline bench + full sweep regeneration.
# Waits for part 2 (irfft_ab) to finish first.
set -u
cd /root/repo
LOG=/tmp/r4_onchip3.log
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

run_step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  if ! wait_tpu; then echo "TPU never recovered; abort" >> "$LOG"; exit 1; fi
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "=== $name exit: $? ($(date -u +%H:%M:%S)) ===" >> "$LOG"
}

for i in $(seq 1 120); do
  grep -q ALL_DONE /tmp/r4_onchip2.log 2>/dev/null && break
  sleep 60
done

run_step bench 700 python bench.py
run_step sweep 3000 python benchmarks/sweep.py
echo "ALL_DONE ($(date -u +%H:%M:%S))" >> "$LOG"
