#!/bin/bash
# Round-5 campaign F: frame decompositions (fixed import), SCC sweep,
# diff-path perf table.
set -u
LOG=examples/campaigns/tpu_campaign_r5f.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-3600}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
echo "CAMPAIGN R5F START $(date +%T)" > "$LOG"
run f1-decomp     python -u examples/regen_decompose2.py --frames 5
run f2-decomp-nee python -u examples/regen_decompose2.py --frames 4 --nee
run f3-scbench    python -u examples/sc_kernel_bench.py --reps 10
run f4-diffperf   python -u examples/diff_perf.py --frames 3
echo "CAMPAIGN R5F DONE $(date +%T)" >> "$LOG"
