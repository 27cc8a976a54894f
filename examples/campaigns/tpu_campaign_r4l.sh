#!/bin/bash
set -u
LOG=examples/tpu_campaign_r4.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
run regen3-nw1m python -u bench.py --only primal --tile-rays 1048576 --verbose
run regen3-nw524k-sort python -u bench.py --only primal --tile-rays 524288 --sort --verbose
run nee3-nw1m python -u bench.py --only nee --nee --tile-rays 1048576 --frames 4 --verbose
echo "CAMPAIGN L DONE $(date +%T)" >> "$LOG"
