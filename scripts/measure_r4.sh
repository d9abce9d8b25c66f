#!/bin/bash
# Round-4 on-chip measurement queue (run sequentially — one chip).
# Usage: bash scripts/measure_r4.sh [logdir]
set -u
LOG=${1:-bench_logs}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

echo "=== measure_r4 start $(date -u +%FT%TZ) ===" | tee -a "$LOG/r4_queue.log"

# 1. (dropped — both halo_chunks arms completed in r4_halo_chunks.log)

# 2. CSR penalty breakdown + window-hop A/B
timeout 2400 python scripts/bench_csr_breakdown.py \
  > "$LOG/r4_csr_breakdown.log" 2>&1
echo "csr exit=$?" | tee -a "$LOG/r4_queue.log"

# 3. unsupervised NCE knob sweep (roofline inputs)
timeout 3600 python scripts/bench_unsup_sweep.py \
  > "$LOG/r4_unsup_sweep.log" 2>&1
echo "unsup exit=$?" | tee -a "$LOG/r4_queue.log"

# 4. Pallas probe; if the window is open, the kernel matrix incl. the
#    round-4 combined gather+fanout-mean arm
timeout 180 python -c "from tpu_sage import kernels; print('probe:', kernels.probe())" \
  > "$LOG/r4_probe2.log" 2>&1
if grep -q "probe: True" "$LOG/r4_probe2.log"; then
  timeout 2400 python scripts/bench_kernels.py > "$LOG/r4_kernels.log" 2>&1
  echo "kernels exit=$?" | tee -a "$LOG/r4_queue.log"
else
  echo "pallas window closed" | tee -a "$LOG/r4_queue.log"
fi

# 5. defaults re-confirmation at HEAD
timeout 1200 python bench.py > "$LOG/r4_bench_head.log" 2>&1
echo "bench exit=$?" | tee -a "$LOG/r4_queue.log"
echo "=== measure_r4 done $(date -u +%FT%TZ) ===" | tee -a "$LOG/r4_queue.log"
