#!/bin/bash
# Round-5 queue, part 4: capacity frontier bisect (train ok at 4.52M /
# compile-OOM at 8.14M; infer compile-OOM at 3.36M).
set -u
LOG=${1:-bench_logs}
cd "$(dirname "$0")/.."
echo "=== measure_r5d start $(date -u +%FT%TZ) ===" | tee -a "$LOG/r5_queue.log"

for frac in 0.7 0.8 0.6; do
  timeout 2400 python scripts/bench_capacity.py --frac $frac \
    > "$LOG/r5_capacity_train$(echo $frac | tr -d .).log" 2>&1
  echo "cap-train$frac exit=$?" | tee -a "$LOG/r5_queue.log"
done
for frac in 0.7 0.5; do
  timeout 2400 python scripts/bench_capacity.py --mode infer --frac $frac \
    > "$LOG/r5_capacity_infer$(echo $frac | tr -d .).log" 2>&1
  echo "cap-infer$frac exit=$?" | tee -a "$LOG/r5_queue.log"
done
# the memory-lean storages at the dense train frontier
timeout 2400 python scripts/bench_capacity.py --frac 0.7 --int8 \
  > "$LOG/r5_capacity_int8.log" 2>&1
echo "cap-int8 exit=$?" | tee -a "$LOG/r5_queue.log"
timeout 2400 python scripts/bench_capacity.py --frac 0.7 --csr \
  > "$LOG/r5_capacity_csr.log" 2>&1
echo "cap-csr exit=$?" | tee -a "$LOG/r5_queue.log"
echo "=== measure_r5d done $(date -u +%FT%TZ) ===" | tee -a "$LOG/r5_queue.log"
