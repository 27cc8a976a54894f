#!/bin/bash
set -u
LOG=examples/tpu_campaign_r4.log
while ! grep -q "CAMPAIGN G DONE" "$LOG"; do sleep 30; done
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-3000}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
run bwd-final python -u bench.py --only backward --backward --frames 3 --verbose
echo "CAMPAIGN H DONE $(date +%T)" >> "$LOG"
