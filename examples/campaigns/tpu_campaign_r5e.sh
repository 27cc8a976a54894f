#!/bin/bash
# Round-5 campaign E: resident-m3 lite sc kernel + frame decompositions.
set -u
LOG=examples/campaigns/tpu_campaign_r5e.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5E START $(date +%T)" > "$LOG"
TMO=3600 run e1-scbench python -u examples/sc_kernel_bench.py --reps 10
run e2-grid    python -u bench.py --only grid --scene grid --frames 3 --verbose
TMO=3600 run e3-decomp  python -u examples/regen_decompose2.py --frames 5
TMO=3600 run e4-decomp-nee python -u examples/regen_decompose2.py --frames 4 --nee
run e5-telem-grid python -u examples/regen_telemetry.py --res 1080 --scene grid --frames 2
echo "CAMPAIGN R5E DONE $(date +%T)" >> "$LOG"
