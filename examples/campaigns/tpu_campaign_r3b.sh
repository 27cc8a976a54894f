#!/bin/bash
# Round-3 TPU campaign, part 2: measure the round's kernel changes
# (any(better) sweep gate, octant counting-sort compaction, row-gather
# state permutes) and build the sorting/compaction decision table.
set -u
cd "$(dirname "$0")/.."
LOG=examples/tpu_campaign_r3b.log
: > "$LOG"

run() {
    local name="$1"; shift
    echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$LOG"
    timeout 3600 "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "=== [$name] exit=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

# 1. MEGA decomposition (bounce-step vs rows kernel, compact on/off,
#    frames) — also re-measures the pallas frame with the sweep gate.
run profile-mega  python -u examples/profile_mega.py

# 2. Demo decision table: octant compaction on the wavefront PALLAS path.
run demo-compact  python -u bench.py --traversal pallas --no-sort --compact --verbose
run mega-compact2 python -u bench.py --traversal mega --verbose
run mega-nee2     python -u bench.py --traversal mega --nee --verbose

# 3. Grid decision table: sort (auto-on) was measured in campaign 1;
#    now no-sort and compaction-only.
run grid-nosort   python -u bench.py --scene grid --frames 4 --no-sort --verbose
run grid-compact  python -u bench.py --scene grid --frames 4 --no-sort --compact --verbose

echo "=== campaign2 done $(date -u +%H:%M:%S)" | tee -a "$LOG"
