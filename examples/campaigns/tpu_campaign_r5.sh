#!/bin/bash
# Round-5 campaign A: effect of the sentinel-packed candidate queues
# (_block_chunk_queue) on all four bench axes. Run from repo root:
#   nohup bash examples/campaigns/tpu_campaign_r5.sh &
set -u
LOG=examples/campaigns/tpu_campaign_r5.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5A START $(date +%T)" > "$LOG"
run a1-primal python -u bench.py --only primal --verbose
run a2-nee    python -u bench.py --only nee --nee --frames 4 --verbose
run a3-grid   python -u bench.py --only grid --scene grid --frames 3 --verbose
TMO=3000 run a4-bwd python -u bench.py --only backward --backward --frames 3 --verbose
echo "CAMPAIGN R5A DONE $(date +%T)" >> "$LOG"
