#!/bin/bash
# Round-3 A/B queue: the per-aggregator matrix, CSR, unsupervised and the
# TPU halo comparison re-measured at the new gather_chunks=8 default.
cd "$(dirname "$0")/.."
run() {
  name=$1; shift
  echo "=== $name $(date)" | tee -a "/tmp/r3_$name.log"
  timeout 3600 "$@" >> "/tmp/r3_$name.log" 2>&1
  echo "--- exit $? $(date)" >> "/tmp/r3_$name.log"
}
for agg in gcn max_pool mean_pool attention lstm; do
  run "agg_$agg" env BENCH_AGG=$agg BENCH_INT8=0 python bench.py
done
run csr env BENCH_CSR=1 python bench.py
run unsup python scripts/bench_unsup.py
run b1024 env BENCH_BATCH=1024 python bench.py
run halo_tpu python scripts/bench_halo.py --steps 200
echo "R3 QUEUE DONE $(date)" >> /tmp/r3_driver.log
