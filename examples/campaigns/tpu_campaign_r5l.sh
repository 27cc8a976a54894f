#!/bin/bash
# Round-5 campaign L: frontier-march traversal on the grid axis (auto +
# QL sweep), NEE with split-pendings merged gather, primal with the
# packed 8-col final log index, mid-scene march.
set -u
LOG=examples/campaigns/tpu_campaign_r5l.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5L START $(date +%T)" > "$LOG"
run l1-grid-march python -u bench.py --only grid --scene grid --frames 3 --verbose
run l2-nee        python -u bench.py --only nee --nee --frames 4 --verbose
run l3-primal     python -u bench.py --only primal --verbose
run l4-grid-ql4   python -u bench.py --only grid --scene grid --frames 3 --march-ql 4 --verbose
run l5-mid        python -u bench.py --only primal --scene mid --frames 6 --verbose
run l6-grid-nomarch python -u bench.py --only grid --scene grid --frames 3 --no-march --verbose
run l7-nee-unfused python -u bench.py --only nee --nee --frames 4 --unfused-nee --verbose
echo "CAMPAIGN R5L DONE $(date +%T)" >> "$LOG"
