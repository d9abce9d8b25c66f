#!/bin/bash
# Round-5 measurement queue: unsup breakdown, CSR owner-select A/B,
# capacity probes, serving matrix, Pallas probe, defaults bench.
set -u
LOG=${1:-bench_logs}
cd "$(dirname "$0")/.."
echo "=== measure_r5 start $(date -u +%FT%TZ) ===" | tee -a "$LOG/r5_queue.log"

timeout 3000 python scripts/bench_unsup_breakdown.py --k 30 --reps 3 \
  > "$LOG/r5_unsup_breakdown.log" 2>&1
echo "unsup-breakdown exit=$?" | tee -a "$LOG/r5_queue.log"

# CSR-partitioned owner-select A/B at the headline graph (vs r4's
# pair-answer 2.593 / dense-shard 2.347 ms/step)
timeout 3000 python - > "$LOG/r5_csr_owner_select.log" 2>&1 <<'EOF'
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from tpu_sage.data.synthetic import bench_store
from tpu_sage.dist.mesh import make_mesh
from tpu_sage.dist.train import PartitionedTrainer
from tpu_sage.train.trainer import TrainConfig

store = bench_store()
mesh = make_mesh()
for arm in ("owner_select", "pair_answers", "dense"):
    cfg = TrainConfig(batch_size=512, n_train_samples=(25, 10),
                      n_val_samples=(25, 10), output_dims=(128, 128),
                      compute_dtype="bfloat16",
                      csr_owner_select=(arm == "owner_select"))
    tr, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
        store, cfg, mesh, csr=(arm != "dense"))
    state = tr.init_state(feat_dim=store.feat_dim)
    steps = 200
    state, m = tr.train_epoch(state, graph, fold_ids, fold_w, n_steps=steps)
    float(m["loss"])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = tr.train_epoch(state, graph, fold_ids, fold_w, n_steps=steps)
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1] / steps
    print(json.dumps({"arm": arm, "owner_select_on": tr.owner_select_on,
                      "ms_per_step": round(1e3 * dt, 3),
                      "edges_per_sec": round(512 * 275 / dt, 1),
                      "loss": float(m["loss"])}), flush=True)
EOF
echo "csr-owner exit=$?" | tee -a "$LOG/r5_queue.log"

# capacity probes (zero stores; big uploads — generous timeouts)
timeout 1800 python scripts/bench_capacity.py --frac 0.5 \
  > "$LOG/r5_capacity_train50.log" 2>&1
echo "cap-train50 exit=$?" | tee -a "$LOG/r5_queue.log"
timeout 2400 python scripts/bench_capacity.py --frac 0.9 \
  > "$LOG/r5_capacity_train90.log" 2>&1
echo "cap-train90 exit=$?" | tee -a "$LOG/r5_queue.log"
timeout 2400 python scripts/bench_capacity.py --mode infer --frac 0.9 \
  > "$LOG/r5_capacity_infer90.log" 2>&1
echo "cap-infer90 exit=$?" | tee -a "$LOG/r5_queue.log"
timeout 2400 python scripts/bench_capacity.py --frac 1.15 \
  > "$LOG/r5_capacity_over.log" 2>&1
echo "cap-over exit=$?" | tee -a "$LOG/r5_queue.log"

# serving matrix: the exact-inference aggregators not yet measured (r4 did
# mean 245.7k and attention 211.4k nodes/s)
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
echo "=== measure_r5 done $(date -u +%FT%TZ) ===" | tee -a "$LOG/r5_queue.log"
