#!/bin/bash
# Round-5 campaign J: ONE merged int32-packed permute gather (regen
# compaction) + one-hot MXU light sampling. Primal, NEE, decompose.
set -u
LOG=examples/campaigns/tpu_campaign_r5j.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5J START $(date +%T)" > "$LOG"
run j1-primal python -u bench.py --only primal --verbose
run j2-nee    python -u bench.py --only nee --nee --frames 4 --verbose
TMO=3600 run j3-decomp python -u examples/regen_decompose2.py --frames 5
echo "CAMPAIGN R5J DONE $(date +%T)" >> "$LOG"
