#!/bin/bash
# Round-5 queue, part 2: pools gather-vs-MXU overlap probe; serving-export
# end-to-end latency; optional attention serving number.
set -u
LOG=${1:-bench_logs}
cd "$(dirname "$0")/.."
echo "=== measure_r5b start $(date -u +%FT%TZ) ===" | tee -a "$LOG/r5_queue.log"

timeout 3000 python scripts/bench_unsup_gather_ab.py --k 30 --reps 3 \
  > "$LOG/r5_unsup_gather_ab.log" 2>&1
echo "unsup-ab exit=$?" | tee -a "$LOG/r5_queue.log"

timeout 4800 python scripts/bench_unsup_whole_ab.py --k 30 --reps 3 \
  > "$LOG/r5_unsup_whole_ab.log" 2>&1
echo "unsup-whole-ab exit=$?" | tee -a "$LOG/r5_queue.log"

timeout 2400 python scripts/bench_pool_overlap.py --k 100 --reps 3 \
  > "$LOG/r5_pool_overlap.log" 2>&1
echo "pool-overlap exit=$?" | tee -a "$LOG/r5_queue.log"

timeout 2400 python scripts/bench_export_latency.py \
  > "$LOG/r5_export_latency.log" 2>&1
echo "export-latency exit=$?" | tee -a "$LOG/r5_queue.log"
timeout 2400 python scripts/bench_export_latency.py --logits \
  > "$LOG/r5_export_latency_logits.log" 2>&1
echo "export-latency-logits exit=$?" | tee -a "$LOG/r5_queue.log"

echo "=== measure_r5b done $(date -u +%FT%TZ) ===" | tee -a "$LOG/r5_queue.log"
