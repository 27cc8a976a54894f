#!/bin/bash
# Round-3 TPU campaign, part 3: per-block front-to-back chunk/superchunk
# visit ordering (scalar-prefetch indirection) — re-measure everything.
set -u
cd "$(dirname "$0")/.."
LOG=examples/tpu_campaign_r3c.log
: > "$LOG"

run() {
    local name="$1"; shift
    echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$LOG"
    timeout 3600 "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "=== [$name] exit=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

run pallas-f2b      python -u bench.py --traversal pallas --verbose
run pallas-nee-f2b  python -u bench.py --traversal pallas --nee --verbose
run mega-f2b        python -u bench.py --traversal mega --verbose
run mega-nee-f2b    python -u bench.py --traversal mega --nee --verbose
run grid-f2b        python -u bench.py --scene grid --frames 4 --verbose
run grid-f2b-nosort python -u bench.py --scene grid --frames 4 --no-sort --verbose
run profile-mega    python -u examples/profile_mega.py

echo "=== campaign3 done $(date -u +%H:%M:%S)" | tee -a "$LOG"
