#!/bin/bash
set -u
LOG=examples/campaigns/tpu_campaign_r5h2.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-3600}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5H2 START $(date +%T)" > "$LOG"
run h2a-scbench python -u examples/sc_kernel_bench.py --reps 10
echo "CAMPAIGN R5H2 DONE $(date +%T)" >> "$LOG"
