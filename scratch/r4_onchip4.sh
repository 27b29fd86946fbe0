#!/bin/bash
# Round-4 on-chip queue, part 4: irfft_ab (retry), carry_ab, bench, sweep.
# Each step retries up to 3 times if its run didn't print DONE/a JSON line
# (tunnel stalls mid-step leave silent truncation; a retry after the
# wait_tpu probe passes is safe because every probe is idempotent).
set -u
cd /root/repo
LOG=/tmp/r4_onchip4.log
: > "$LOG"

probe() {
  timeout 90 python -c "
import jax
assert jax.default_backend() == 'tpu'
print(float(jax.numpy.sum(jax.numpy.ones((8,128)))), flush=True)
" >> /dev/null 2>&1
}

wait_tpu() {
  for i in $(seq 1 400); do
    probe && return 0
    sleep 60
  done
  return 1
}

run_step() {  # name timeout marker cmd...
  local name=$1 tmo=$2 marker=$3; shift 3
  for attempt in 1 2 3; do
    echo "=== $name attempt $attempt ($(date -u +%H:%M:%S)) ===" >> "$LOG"
    if ! wait_tpu; then echo "TPU never recovered; abort" >> "$LOG"; exit 1; fi
    local out=/tmp/r4_step_${name}_${attempt}.log
    timeout "$tmo" "$@" > "$out" 2>&1
    local rc=$?
    cat "$out" >> "$LOG"
    echo "=== $name attempt $attempt exit: $rc ($(date -u +%H:%M:%S)) ===" >> "$LOG"
    grep -q "$marker" "$out" && return 0
    sleep 120
  done
  echo "=== $name FAILED after 3 attempts ===" >> "$LOG"
}

run_step irfft_ab 1500 "DONE" python scratch/r4_irfft_ab.py
run_step carry_ab 1500 "DONE" python scratch/r4_carry_ab.py
echo "ALL_DONE ($(date -u +%H:%M:%S))" >> "$LOG"
