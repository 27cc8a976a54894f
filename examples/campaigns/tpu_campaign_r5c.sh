#!/bin/bash
# Round-5 campaign C: regen v4 (retirement log) vs v3 (column scatters)
# on the bench axes.
set -u
LOG=examples/campaigns/tpu_campaign_r5c.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5C START $(date +%T)" > "$LOG"
run c1-primal-log python -u bench.py --only primal --verbose
run c2-nee-log    python -u bench.py --only nee --nee --frames 4 --verbose
run c3-grid-log   python -u bench.py --only grid --scene grid --frames 3 --verbose
run c4-telem-demo python -u examples/regen_telemetry.py --res 1080
echo "CAMPAIGN R5C DONE $(date +%T)" >> "$LOG"
