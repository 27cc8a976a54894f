#!/bin/bash
# Round-5 campaign M: K-step march (3-candidate advance) on grid/mid,
# QL sweep, unfused-NEE A/B (import fix), march diag with K-step.
set -u
LOG=examples/campaigns/tpu_campaign_r5m.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5M START $(date +%T)" > "$LOG"
run m1-grid-k3ql4 python -u bench.py --only grid --scene grid --frames 3 --verbose
run m2-grid-k3ql8 python -u bench.py --only grid --scene grid --frames 3 --march-ql 8 --verbose
run m3-diag       python -u examples/march_diag.py --ql 4
run m4-nee-unfused python -u bench.py --only nee --nee --frames 4 --unfused-nee --verbose
run m5-mid        python -u bench.py --only primal --scene mid --frames 6 --verbose
run m6-mid-nomarch python -u bench.py --only primal --scene mid --frames 6 --no-march --verbose
echo "CAMPAIGN R5M DONE $(date +%T)" >> "$LOG"
