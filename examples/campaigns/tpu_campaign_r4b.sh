#!/bin/bash
# Round-4 TPU campaign B: decompose the 4x frame mystery (frame2), regen
# retire-pattern shapes (micro2), fixed NEE-regen bench, parity render,
# backward bench. Waits for campaign A to finish first.
set -u
LOG=examples/tpu_campaign_r4.log
while ! grep -q "CAMPAIGN A DONE" "$LOG"; do sleep 30; done
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-3000}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
run frame2 python -u examples/profile_r4.py frame2
run micro2 python -u examples/profile_r4.py micro2
run regen-nee2 python -u bench.py --only nee --nee --regen --frames 4 --verbose
run std-nee python -u bench.py --only nee --nee --frames 4 --verbose
run backward python -u bench.py --only backward --backward --frames 3 --verbose
run parity python -u examples/parity_render.py --frames 48
echo "CAMPAIGN B DONE $(date +%T)" >> "$LOG"
