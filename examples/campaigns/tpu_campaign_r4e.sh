#!/bin/bash
# Round-4 TPU campaign E: regen per-iteration decomposition.
set -u
LOG=examples/tpu_campaign_r4.log
while ! grep -q "CAMPAIGN D DONE" "$LOG"; do sleep 30; done
run() {
  local name=$1; shift
  echo "=== [$name] $(date +%T) :: $*" >> "$LOG"
  timeout "${TMO:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== [$name] exit=$? $(date +%T)" >> "$LOG"
}
run rd-while python -u examples/regen_decompose.py --variant while
for v in all skip_trace skip_permute skip_spawn skip_append glue; do
  run rd-$v python -u examples/regen_decompose.py --variant $v
done
echo "CAMPAIGN E DONE $(date +%T)" >> "$LOG"
