#!/bin/bash
# Round-5 campaign N: K=6 march + multi-stage drain vs no-march+drain on
# grid/mid; unfused-NEE default; primal with drain.
set -u
LOG=examples/campaigns/tpu_campaign_r5n.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5N START $(date +%T)" > "$LOG"
run n1-primal-drain python -u bench.py --only primal --verbose
run n2-nee-unfused  python -u bench.py --only nee --nee --frames 4 --verbose
run n3-grid-nomarch python -u bench.py --only grid --scene grid --frames 3 --no-march --verbose
run n4-grid-k6      python -u bench.py --only grid --scene grid --frames 3 --verbose
run n5-mid-nomarch  python -u bench.py --only primal --scene mid --frames 6 --no-march --verbose
run n6-mid-k6       python -u bench.py --only primal --scene mid --frames 6 --verbose
echo "CAMPAIGN R5N DONE $(date +%T)" >> "$LOG"
