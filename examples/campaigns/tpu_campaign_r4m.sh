#!/bin/bash
set -u
LOG=examples/tpu_campaign_r4.log
while ! grep -q "CAMPAIGN L DONE" "$LOG"; do sleep 20; done
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
run nee3-524k-sorted python -u bench.py --only nee --nee --tile-rays 524288 --sort --verbose
echo "CAMPAIGN M DONE $(date +%T)" >> "$LOG"
