#!/bin/bash
# Round-5 campaign O: nw sweep with 2-stage drain (primal/NEE); mid
# no-march REPEATED (n5 vs m6 discrepancy: 30043 vs 1872 ms on the same
# flags — resolve before setting the march default); grid at 512k.
set -u
LOG=examples/campaigns/tpu_campaign_r5o.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5O START $(date +%T)" > "$LOG"
run o1-mid-nomarch-a python -u bench.py --only primal --scene mid --frames 6 --no-march --verbose
run o2-primal-512k python -u bench.py --only primal --tile-rays 524288 --verbose
run o3-primal-768k python -u bench.py --only primal --tile-rays 786432 --verbose
run o4-mid-nomarch-b python -u bench.py --only primal --scene mid --frames 6 --no-march --verbose
run o5-nee-512k    python -u bench.py --only nee --nee --frames 4 --tile-rays 524288 --verbose
run o6-grid-512k   python -u bench.py --only grid --scene grid --frames 3 --no-march --tile-rays 524288 --verbose
echo "CAMPAIGN R5O DONE $(date +%T)" >> "$LOG"
