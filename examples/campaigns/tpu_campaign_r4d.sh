#!/bin/bash
# Round-4 TPU campaign D: grid with sorted-lane regen, backward decompose.
set -u
LOG=examples/tpu_campaign_r4.log
while ! grep -q "CAMPAIGN C DONE" "$LOG"; do sleep 30; done
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-3000}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
run grid-regen-sort python -u bench.py --scene grid --regen --frames 3 --verbose
run grid-std python -u bench.py --only grid --scene grid --frames 3 --verbose
run bwd python -u examples/profile_r4.py bwd
echo "CAMPAIGN D DONE $(date +%T)" >> "$LOG"
