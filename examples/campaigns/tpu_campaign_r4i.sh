#!/bin/bash
set -u
LOG=examples/tpu_campaign_r4.log
while ! grep -q "CAMPAIGN H DONE" "$LOG"; do sleep 20; done
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
run micro4 python -u examples/profile_r4.py micro4
echo "CAMPAIGN I DONE $(date +%T)" >> "$LOG"
