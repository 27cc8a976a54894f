#!/bin/bash
# Round-5 campaign I: final — grid with the sc-aligned lane-sort key,
# then the full default bench (the driver's BENCH record preview).
set -u
LOG=examples/campaigns/tpu_campaign_r5i.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5I START $(date +%T)" > "$LOG"
run i1-grid-sckey python -u bench.py --only grid --scene grid --frames 3 --sort-key chunk --verbose
TMO=7200 run i2-full python -u bench.py --verbose
echo "CAMPAIGN R5I DONE $(date +%T)" >> "$LOG"
