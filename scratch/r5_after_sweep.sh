#!/bin/bash
# Wait for the running sweep to finish, then run the complex tile probe.
set -u
cd /root/repo
for i in $(seq 1 120); do
  pgrep -f "benchmarks/sweep.py" > /dev/null || break
  sleep 30
done
sleep 30
timeout 2700 python scratch/r5_ctile_probe.py > /tmp/r5_ctile_probe.log 2>&1
echo "ctile exit: $?" >> /tmp/r5_ctile_probe.log
