#!/bin/bash
# Round-3 TPU measurement campaign (VERDICT r2 items 1, 2, 4, 7 + grid
# re-measure). Each experiment runs in its own process (fresh worker
# state); a hung/crashed worker is contained by `timeout` and the next
# experiment proceeds. Logs to examples/tpu_campaign_r3.log.
set -u
cd "$(dirname "$0")/.."
LOG=examples/tpu_campaign_r3.log
: > "$LOG"

run() {
    local name="$1"; shift
    echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$LOG"
    timeout 3600 "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "=== [$name] exit=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

# 1. Compiled shard_map+Mosaic on the real chip (VERDICT item 7).
run sharded python -u examples/sharded_onchip.py --res 256 --diff

# 2-3. PALLAS baseline, primal + NEE (mostly cache-warm).
run pallas      python -u bench.py --traversal pallas --verbose
run pallas-nee  python -u bench.py --traversal pallas --nee --verbose

# 4-5. MEGA race, primal + NEE (VERDICT items 1 and 4).
run mega        python -u bench.py --traversal mega --verbose
run mega-nee    python -u bench.py --traversal mega --nee --verbose

# 6. Backward number at 1080p (VERDICT item 2). Biggest compile; fewer
#    frames keeps the scan body bounded.
run backward    python -u bench.py --backward --frames 4 --verbose

# 7. Grid scene re-measure (VERDICT item 3 baseline).
run grid        python -u bench.py --scene grid --frames 4 --verbose

echo "=== campaign done $(date -u +%H:%M:%S)" | tee -a "$LOG"
