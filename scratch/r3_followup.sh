#!/bin/bash
# Round-3 follow-up: re-run probe sections that were contaminated (C: the
# 1-CPU host was also running pytest) or crashed (B: v2 VMEM OOM, fixed by
# the 4MB block cap; D: flaky remote compile) the first time through.
# Run AFTER /tmp/r3_onchip_run.sh finishes; appends to /tmp/r3_probes2.log.
set -u
cd /root/repo
: > /tmp/r3_probes2.log
for s in B C D; do
  echo "--- section $s ($(date -u)) ---" >> /tmp/r3_probes2.log
  timeout 700 python scratch/drive_r3_probes.py "$s" >> /tmp/r3_probes2.log 2>&1
  echo "--- section $s exit: $? ---" >> /tmp/r3_probes2.log
done
echo "FOLLOWUP DONE ($(date -u))" >> /tmp/r3_probes2.log
