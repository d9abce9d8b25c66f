#!/bin/bash
# Round-2g measurement queue: run when the axon tunnel is back.
# Each step is independent; results append to /tmp/r2g_*.log.
# Compile can take 2-20 min per program family on axon (STATUS.md) —
# run detached, poll the logs, do NOT wrap in short timeouts.
cd "$(dirname "$0")/.."

run() {  # run <name> <cmd...>
  name=$1; shift
  echo "=== $name $(date)" | tee -a "/tmp/r2g_$name.log"
  # cap each run at 1h: axon compiles can take 10-20 min (STATUS.md), but a
  # hang must not stall the rest of the unattended queue
  timeout 3600 "$@" >> "/tmp/r2g_$name.log" 2>&1
  echo "--- exit $? $(date)" >> "/tmp/r2g_$name.log"
}

# 0. Pallas probe ritual (VERDICT #9): record pass or hang either way
run probe timeout 300 python -c "from tpu_sage import kernels; print('pallas probe:', kernels.probe())"

# 1. Headline: mean int8 with fused fanout-mean chunked gather (round 2f)
#    baseline to beat: 45.5M (/tmp/bench_mean_chunk1.log, pre-fusion)
run headline python bench.py

# 2. A/B: chunking off (single fused gather+mean) — isolates the overlap win
run headline_nochunk env TPU_SAGE_GATHER_CHUNKS=1 python bench.py

# 2b. A/B: round-2e behavior (full last-level gather, unfused summary)
run headline_nofuse env TPU_SAGE_FUSE_LAST=0 python bench.py

# 2c. per-aggregator fused-summary effect (pools/attention/lstm changed most;
#     watch lstm — per-chunk scans may regress). bf16 storage so the nofuse
#     arm reproduces the round-2e table rows directly; int8 is now
#     quality-checked for every aggregator (test_quantize.py) and can be
#     A/B'd separately once the fusion verdicts are in.
for agg in gcn max_pool mean_pool attention lstm; do
  run "agg_$agg" env BENCH_AGG=$agg BENCH_INT8=0 python bench.py
  run "agg_${agg}_nofuse" env BENCH_AGG=$agg BENCH_INT8=0 TPU_SAGE_FUSE_LAST=0 python bench.py
done

# 3. dense bf16 storage
run headline_bf16 env BENCH_INT8=0 python bench.py

# 4. CSR refresh (chunked element gathers + fused fanout-mean)
run csr env BENCH_CSR=1 python bench.py

# 5. unsupervised single-device (deepest level 1.5M rows — the fusion's
#    biggest relative surface); compare vs RESULTS.md 58.1 ms/step
run unsup python scripts/bench_unsup.py

# 6. partitioned 1-shard structural overhead refresh (fused halo mean)
run halo python scripts/bench_halo.py
