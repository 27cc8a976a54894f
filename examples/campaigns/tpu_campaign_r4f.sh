#!/bin/bash
# Round-4 TPU campaign F: backward after gather-split + checkpoint knob;
# fresh regen/std re-baselines on the gather-split code.
set -u
LOG=examples/tpu_campaign_r4.log
while ! grep -q "CAMPAIGN E DONE" "$LOG"; do sleep 30; done
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-3000}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
run bwd2 python -u examples/profile_r4.py bwd
run bwd-bench python -u bench.py --only backward --backward --frames 3 --verbose
echo "CAMPAIGN F DONE $(date +%T)" >> "$LOG"
