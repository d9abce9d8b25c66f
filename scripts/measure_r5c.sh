#!/bin/bash
# Round-5 queue, part 3: serving matrix, final bench, probe, then the
# capacity probes (timeout-prone on this tunnel — last) with a scale bisect.
set -u
LOG=${1:-bench_logs}
cd "$(dirname "$0")/.."
echo "=== measure_r5c start $(date -u +%FT%TZ) ===" | tee -a "$LOG/r5_queue.log"

timeout 4800 python scripts/bench_unsup_chunk_sweep.py \
  > "$LOG/r5_unsup_chunk_sweep.log" 2>&1
echo "unsup-chunk-sweep exit=$?" | tee -a "$LOG/r5_queue.log"

for agg in gcn mean_pool max_pool; do
  BENCH_AGG=$agg timeout 1800 python scripts/bench_infer.py \
    > "$LOG/r5_infer_$agg.log" 2>&1
  echo "infer-$agg exit=$?" | tee -a "$LOG/r5_queue.log"
done

timeout 300 python -c "from tpu_sage import kernels; print('probe:', kernels.probe())" \
  > "$LOG/r5_probe2.log" 2>&1
if grep -q "probe: True" "$LOG/r5_probe2.log"; then
  timeout 2400 python scripts/bench_kernels.py > "$LOG/r5_kernels.log" 2>&1
  timeout 2400 python scripts/bench_gather_mean.py > "$LOG/r5_gather_mean_kernel.log" 2>&1
  echo "kernels exit=$?" | tee -a "$LOG/r5_queue.log"
else
  echo "pallas window closed (probe2)" | tee -a "$LOG/r5_queue.log"
fi

timeout 1200 python bench.py > "$LOG/r5_bench_final.log" 2>&1
echo "bench exit=$?" | tee -a "$LOG/r5_queue.log"

# capacity: bisect the compile-hang scale first (1M should be quick if the
# hang is allocation-scale-dependent), then the envelope points
timeout 1200 python scripts/bench_capacity.py --frac 0.11 \
  > "$LOG/r5_capacity_1m.log" 2>&1
echo "cap-1m exit=$?" | tee -a "$LOG/r5_queue.log"
timeout 1800 python scripts/bench_capacity.py --frac 0.27 \
  > "$LOG/r5_capacity_2p4m.log" 2>&1
echo "cap-2p4m exit=$?" | tee -a "$LOG/r5_queue.log"
timeout 2400 python scripts/bench_capacity.py --frac 0.5 \
  > "$LOG/r5_capacity_train50.log" 2>&1
echo "cap-train50 exit=$?" | tee -a "$LOG/r5_queue.log"
timeout 2400 python scripts/bench_capacity.py --mode infer --frac 0.9 \
  > "$LOG/r5_capacity_infer90.log" 2>&1
echo "cap-infer90 exit=$?" | tee -a "$LOG/r5_queue.log"
timeout 3000 python scripts/bench_capacity.py --frac 0.9 \
  > "$LOG/r5_capacity_train90.log" 2>&1
echo "cap-train90 exit=$?" | tee -a "$LOG/r5_queue.log"
timeout 2400 python scripts/bench_capacity.py --frac 1.15 \
  > "$LOG/r5_capacity_over.log" 2>&1
echo "cap-over exit=$?" | tee -a "$LOG/r5_queue.log"

echo "=== measure_r5c done $(date -u +%FT%TZ) ===" | tee -a "$LOG/r5_queue.log"
