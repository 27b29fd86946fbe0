#!/bin/bash
# Round-4 final on-chip chain: wait for /tmp/drive.py to finish, then
# irfft_ab (post-fix re-measure), bench.py, full sweep. One process per
# step, serialized on the single chip.
set -u
cd /root/repo
LOG=/tmp/r4_final.log
: > "$LOG"

# wait for the verify drive to release the chip
for i in $(seq 1 60); do
  pgrep -f "python /tmp/drive.py" > /dev/null || break
  sleep 15
done

probe() {
  timeout 90 python -c "
import jax
assert jax.default_backend() == 'tpu'
print(float(jax.numpy.sum(jax.numpy.ones((8,128)))), flush=True)
" >> /dev/null 2>&1
}

run_step() {  # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  for i in $(seq 1 20); do probe && break; sleep 60; done
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "=== $name exit: $? ($(date -u +%H:%M:%S)) ===" >> "$LOG"
}

run_step irfft_ab 1200 python scratch/r4_irfft_ab.py
run_step bench 700 python bench.py
run_step sweep 3000 python benchmarks/sweep.py
echo "ALL_DONE ($(date -u +%H:%M:%S))" >> "$LOG"
