#!/bin/bash
# Round-4 on-chip queue, part 2 (runs after scratch/r4_onchip.sh's queue).
set -u
cd /root/repo
LOG=/tmp/r4_onchip2.log
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

# wait for part 1 to finish (its log gains ALL_DONE) or 90 min
for i in $(seq 1 90); do
  grep -q ALL_DONE /tmp/r4_onchip.log 2>/dev/null && break
  sleep 60
done

run_step irfft_ab 1200 python scratch/r4_irfft_ab.py
echo "ALL_DONE ($(date -u +%H:%M:%S))" >> "$LOG"
