#!/bin/bash
set -u
LOG=examples/tpu_campaign_r4.log
while ! grep -q "CAMPAIGN I DONE" "$LOG"; do sleep 20; done
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-3000}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
run regen3-demo python -u bench.py --only primal --regen --verbose
run grid-auto python -u bench.py --only grid --scene grid --frames 3 --verbose
run nee-regen3 python -u bench.py --only nee --nee --regen --frames 4 --verbose
echo "CAMPAIGN J DONE $(date +%T)" >> "$LOG"
