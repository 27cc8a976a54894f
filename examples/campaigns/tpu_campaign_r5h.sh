#!/bin/bash
# Round-5 campaign H: clean measurement — nw=384k + SCC=8 defaults,
# split-gather experiments reverted. Plus small-SCC sweep + diff perf.
set -u
LOG=examples/campaigns/tpu_campaign_r5h.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5H START $(date +%T)" > "$LOG"
run h1-primal python -u bench.py --only primal --verbose
run h2-nee    python -u bench.py --only nee --nee --frames 4 --verbose
run h3-grid   python -u bench.py --only grid --scene grid --frames 3 --verbose
TMO=3600 run h4-scbench python -u examples/sc_kernel_bench.py --reps 10
TMO=3600 run h5-diffperf python -u examples/diff_perf.py --frames 3
echo "CAMPAIGN R5H DONE $(date +%T)" >> "$LOG"
