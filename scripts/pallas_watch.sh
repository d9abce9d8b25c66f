#!/bin/bash
# Poll the Pallas probe; when a window opens, run the kernel matrix at once
# (SKIP_PROBE=1 — the window can close within a minute). One-shot: exits
# after the first completed bench or after MAX_POLLS.
set -u
LOG=${1:-bench_logs}
MAX_POLLS=${MAX_POLLS:-40}
cd "$(dirname "$0")/.."
for i in $(seq 1 "$MAX_POLLS"); do
  if timeout 180 python -c "from tpu_sage import kernels; import sys; sys.exit(0 if kernels.probe() else 1)" > /dev/null 2>&1; then
    echo "window open at poll $i $(date -u +%FT%TZ)" | tee -a "$LOG/r4_queue.log"
    SKIP_PROBE=1 timeout 2400 python scripts/bench_kernels.py > "$LOG/r4_kernels.log" 2>&1
    echo "kernels exit=$? (poll $i)" | tee -a "$LOG/r4_queue.log"
    if grep -q '"op": "gather_fanout_mean"' "$LOG/r4_kernels.log"; then
      exit 0
    fi
  fi
  sleep 540
done
echo "pallas watch: no usable window in $MAX_POLLS polls" | tee -a "$LOG/r4_queue.log"
