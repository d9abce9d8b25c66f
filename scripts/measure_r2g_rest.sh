#!/bin/bash
# Continuation of measure_r2g.sh: probe + headline + kernels already done.
cd "$(dirname "$0")/.."
run() {
  name=$1; shift
  echo "=== $name $(date)" | tee -a "/tmp/r2g_$name.log"
  timeout 3600 "$@" >> "/tmp/r2g_$name.log" 2>&1
  echo "--- exit $? $(date)" >> "/tmp/r2g_$name.log"
}
run headline_nochunk env TPU_SAGE_GATHER_CHUNKS=1 python bench.py
run headline_nofuse env TPU_SAGE_FUSE_LAST=0 python bench.py
for agg in gcn max_pool mean_pool attention lstm; do
  run "agg_$agg" env BENCH_AGG=$agg BENCH_INT8=0 python bench.py
  run "agg_${agg}_nofuse" env BENCH_AGG=$agg BENCH_INT8=0 TPU_SAGE_FUSE_LAST=0 python bench.py
done
run headline_bf16 env BENCH_INT8=0 python bench.py
run csr env BENCH_CSR=1 python bench.py
run unsup python scripts/bench_unsup.py
run halo python scripts/bench_halo.py
echo "QUEUE DONE $(date)" >> /tmp/r2g_driver.log
