#!/bin/bash
# Round-3 on-chip sequence, run as soon as the TPU tunnel recovers:
#   1. probe queue (scratch/drive_r3_probes.py, sections A-H)
#   2. headline bench (bench.py)
#   3. full sweep (benchmarks/sweep.py) -> regenerated RESULTS.{md,json}
# Each step under its own timeout so a tunnel relapse can't hang the run.
# Logs: /tmp/r3_probes.log, /tmp/r3_bench.log, /tmp/r3_sweep.log
set -u
cd /root/repo

echo "=== waiting for TPU ($(date -u)) ==="
for i in $(seq 1 400); do
  if timeout 90 python -c "
import jax
assert jax.default_backend() == 'tpu'
print('sum:', float(jax.numpy.sum(jax.numpy.ones((8,128)))), flush=True)
" > /tmp/tpu_probe_last.log 2>&1; then
    echo "TPU RECOVERED at attempt $i: $(date -u)"
    break
  fi
  if [ "$i" = 400 ]; then
    echo "TPU still down after 400 attempts; giving up"
    exit 1
  fi
  sleep 90
done

echo "=== probes ($(date -u)) ==="
# one process per section: a Mosaic failure or tunnel relapse in one
# section must not take down the rest of the queue
: > /tmp/r3_probes.log
for s in A B C D E F G H I; do
  echo "--- section $s ($(date -u)) ---" >> /tmp/r3_probes.log
  timeout 700 python scratch/drive_r3_probes.py "$s" >> /tmp/r3_probes.log 2>&1
  echo "--- section $s exit: $? ---" >> /tmp/r3_probes.log
done
echo "probes done ($(date -u))"
tail -3 /tmp/r3_probes.log

echo "=== bench ($(date -u)) ==="
timeout 600 python bench.py > /tmp/r3_bench.log 2>&1
echo "bench exit: $? ($(date -u))"
tail -2 /tmp/r3_bench.log

echo "=== sweep ($(date -u)) ==="
timeout 2400 python benchmarks/sweep.py > /tmp/r3_sweep.log 2>&1
echo "sweep exit: $? ($(date -u))"
tail -3 /tmp/r3_sweep.log

echo "=== DONE ($(date -u)) ==="
