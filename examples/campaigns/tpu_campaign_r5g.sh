#!/bin/bash
# Round-5 campaign G: split permute + nw=384k defaults on all axes.
set -u
LOG=examples/campaigns/tpu_campaign_r5g.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5G START $(date +%T)" > "$LOG"
run g1-primal python -u bench.py --only primal --verbose
run g2-nee    python -u bench.py --only nee --nee --frames 4 --verbose
run g3-nee524 python -u bench.py --only nee --nee --frames 4 --tile-rays 524288 --verbose
run g4-grid   python -u bench.py --only grid --scene grid --frames 3 --verbose
run g5-grid524 python -u bench.py --only grid --scene grid --frames 3 --tile-rays 524288 --verbose
run g6-primal448 python -u bench.py --only primal --tile-rays 458752 --verbose
run g7-primal320 python -u bench.py --only primal --tile-rays 327680 --verbose
TMO=3600 run g8-scbench python -u examples/sc_kernel_bench.py --reps 10
echo "CAMPAIGN R5G DONE $(date +%T)" >> "$LOG"
