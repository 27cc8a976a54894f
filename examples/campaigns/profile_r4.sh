#!/bin/bash
# Round-4 diagnostic campaign: one stage per process (remote-compile
# request-body limit — docs/STATUS.md "Megakernel HTTP 413").
set -u
LOG=examples/profile_r4.log
: > "$LOG"
for stage in micro kernels frame; do
  echo "=== [$stage] $(date +%T) ===" >> "$LOG"
  timeout 3000 python -u examples/profile_r4.py "$stage" >> "$LOG" 2>&1
  echo "=== [$stage] exit=$? $(date +%T) ===" >> "$LOG"
done
echo "ALL DONE $(date +%T)" >> "$LOG"
