#!/bin/bash
# Round-5 campaign B: clean re-measurement of all axes after the
# sentinel queues + per-ray gating + sub-chunk phase-B refinement +
# one-hot material fetch landed, plus the regen telemetry runs and the
# chunk-sort-key variant.
set -u
LOG=examples/campaigns/tpu_campaign_r5b.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5B START $(date +%T)" > "$LOG"
run b1-primal python -u bench.py --only primal --verbose
run b2-nee    python -u bench.py --only nee --nee --frames 4 --verbose
run b3-bwd    python -u bench.py --only backward --backward --frames 3 --verbose
run b4-grid   python -u bench.py --only grid --scene grid --frames 3 --verbose
run b5-telem-demo python -u examples/regen_telemetry.py --res 1080
run b6-telem-nee  python -u examples/regen_telemetry.py --res 1080 --nee
TMO=3600 run b7-telem-grid python -u examples/regen_telemetry.py --res 1080 --scene grid --frames 2
echo "CAMPAIGN R5B DONE $(date +%T)" >> "$LOG"
