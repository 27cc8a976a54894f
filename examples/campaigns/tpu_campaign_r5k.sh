#!/bin/bash
# Round-5 campaign K: merged permute on NEE + one-hot light sampling;
# primal decompose at the new 240 ms baseline; final-index micro.
set -u
LOG=examples/campaigns/tpu_campaign_r5k.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5K START $(date +%T)" > "$LOG"
run k1-nee    python -u bench.py --only nee --nee --frames 4 --verbose
run k2-micro5 python -u examples/profile_r4.py micro5
TMO=3600 run k3-decomp python -u examples/regen_decompose2.py --frames 5
echo "CAMPAIGN R5K DONE $(date +%T)" >> "$LOG"
