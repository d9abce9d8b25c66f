#!/bin/bash
# Round-2i extras, chained after measure_r2g_rest.sh completes:
#  - TPU_SAGE_INT8_SUMMEAN=0 whole-program A/B (commit 85d4ce6's claim)
#  - batch-1024 under the fused fanout-mean (does fusion move the optimum?)
#  - step breakdown at HEAD (where did the fused win land?)
cd "$(dirname "$0")/.."
while ! grep -q "QUEUE DONE" /tmp/r2g_driver.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name $(date)" | tee -a "/tmp/r2g_$name.log"
  timeout 3600 "$@" >> "/tmp/r2g_$name.log" 2>&1
  echo "--- exit $? $(date)" >> "/tmp/r2g_$name.log"
}
run headline_summean0 env TPU_SAGE_INT8_SUMMEAN=0 python bench.py
run headline_b1024 env BENCH_BATCH=1024 python bench.py
run breakdown python scripts/bench_step_breakdown.py
echo "EXTRAS DONE $(date)" >> /tmp/r2g_driver.log
