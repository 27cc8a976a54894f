#!/bin/bash
# Round-4 TPU campaign A: path-regeneration benches + round-4 diagnostics
# + sort-boundary scene. One process per stage (compile request limit).
set -u
LOG=examples/tpu_campaign_r4.log
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-3000}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
: >> "$LOG"
run regen-bench python -u bench.py --only primal --regen --verbose
run regen-nee python -u bench.py --only nee --regen --frames 4 --verbose
run regen-check-512 python -u examples/regen_check.py --res 512
run kernels python -u examples/profile_r4.py kernels
run frame python -u examples/profile_r4.py frame
run micro python -u examples/profile_r4.py micro
run mid-sort-auto python -u bench.py --scene mid --frames 6 --verbose
run mid-sort-off python -u bench.py --scene mid --frames 6 --no-sort --verbose
run grid-regen python -u bench.py --scene grid --regen --frames 3 --verbose
echo "CAMPAIGN A DONE $(date +%T)" >> "$LOG"
