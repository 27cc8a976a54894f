#!/bin/bash
# Round-4 TPU campaign C: regen v2a (log retirement) benches.
set -u
LOG=examples/tpu_campaign_r4.log
while ! grep -q "CAMPAIGN B DONE" "$LOG"; do sleep 30; done
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-3000}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
run regen2-bench python -u bench.py --only primal --regen --verbose
run regen2-nw768k python -u bench.py --only primal --regen --tile-rays 786432 --verbose
run mid-recheck python -u bench.py --scene mid --frames 6 --verbose
echo "CAMPAIGN C DONE $(date +%T)" >> "$LOG"
