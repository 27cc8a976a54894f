#!/bin/bash
# Round-5 campaign D: v4 retirement log WITH the denormal-pid fix, the
# lite superchunk kernel for the grid axis, and the sc kernel isolation
# bench.
set -u
LOG=examples/campaigns/tpu_campaign_r5d.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5D START $(date +%T)" > "$LOG"
run d1-primal python -u bench.py --only primal --verbose
run d2-nee    python -u bench.py --only nee --nee --frames 4 --verbose
run d3-grid   python -u bench.py --only grid --scene grid --frames 3 --verbose
TMO=3600 run d4-scbench python -u examples/sc_kernel_bench.py --reps 10
run d5-telem-demo python -u examples/regen_telemetry.py --res 1080
echo "CAMPAIGN R5D DONE $(date +%T)" >> "$LOG"
