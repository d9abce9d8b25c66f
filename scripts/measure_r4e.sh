#!/bin/bash
# Round-4 continuation queue #2 (runs after measure_r4d finishes):
#   1. per-chunk projection A/B at the L2 stage (bench_chunk_project.py)
#   2. exact full-graph inference throughput for the attention aggregator
#      (new exact-eval capability this session)
#   3. Pallas probe retry
set -u
LOG=${1:-bench_logs}
cd "$(dirname "$0")/.."

# wait for measure_r4d to finish (its last line in the queue log)
for i in $(seq 1 200); do
  if grep -q "measure_r4d done" "$LOG/r4_queue.log"; then break; fi
  sleep 60
done
echo "=== measure_r4e start $(date -u +%FT%TZ) ===" | tee -a "$LOG/r4_queue.log"

timeout 2400 python scripts/bench_chunk_project.py > "$LOG/r4e_chunk_project.log" 2>&1
echo "chunk-project exit=$? $(date -u +%FT%TZ)" | tee -a "$LOG/r4_queue.log"
tail -8 "$LOG/r4e_chunk_project.log"

BENCH_AGG=attention timeout 1800 python scripts/bench_infer.py > "$LOG/r4e_infer_attention.log" 2>&1
echo "infer-attention exit=$? $(date -u +%FT%TZ)" | tee -a "$LOG/r4_queue.log"
tail -1 "$LOG/r4e_infer_attention.log"

timeout 180 python -c "from tpu_sage import kernels; print('probe:', kernels.probe())" \
  > "$LOG/r4e_probe.log" 2>&1
cat "$LOG/r4e_probe.log"
if grep -q "probe: True" "$LOG/r4e_probe.log"; then
  SKIP_PROBE=1 timeout 2400 python scripts/bench_kernels.py > "$LOG/r4e_kernels.log" 2>&1
  echo "kernels exit=$?" | tee -a "$LOG/r4_queue.log"
fi
echo "=== measure_r4e done $(date -u +%FT%TZ) ===" | tee -a "$LOG/r4_queue.log"
