#!/bin/bash
# Round-4 queue #2: OGBN-shape partitioned re-run at the chunked default,
# per-aggregator matrix at HEAD, Pallas probe retry.
set -u
LOG=${1:-bench_logs}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
echo "=== measure_r4b start $(date -u +%FT%TZ) ===" | tee -a "$LOG/r4_queue.log"

# 1. OGBN-products shape through the PartitionedTrainer (r3: 4.60 ms/step
#    unchunked; halo_chunks=10 is now the default)
timeout 2400 python - > "$LOG/r4_ogbn_partitioned.log" 2>&1 <<'EOF'
import json, os, sys, time
sys.path.insert(0, os.getcwd())
import jax, jax.numpy as jnp
from tpu_sage.data.synthetic import bench_store
from tpu_sage.dist.mesh import make_mesh
from tpu_sage.dist.train import PartitionedTrainer
from tpu_sage.train.trainer import TrainConfig

store = bench_store(n_nodes=2_449_029, feat_dim=100, max_degree=64, seed=0)
cfg = TrainConfig(batch_size=1024, n_train_samples=(15, 10),
                  n_val_samples=(15, 10), output_dims=(128, 128),
                  compute_dtype="bfloat16")
mesh = make_mesh()
tr, graph, fold_ids, fold_w = PartitionedTrainer.from_store(store, cfg, mesh)
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
edges = 1024 * (15 + 150)
print(json.dumps({"config": "ogbn_products_shape_partitioned_1chip",
                  "halo_chunks": 10, "ms_per_step": round(1e3 * dt, 3),
                  "edges_per_sec": round(edges / dt, 1)}), flush=True)
EOF
echo "ogbn exit=$?" | tee -a "$LOG/r4_queue.log"

# 2. per-aggregator matrix at HEAD (gcn + pools + attention; lstm hidden 512)
for AGG in gcn mean_pool max_pool attention lstm; do
  BENCH_AGG=$AGG timeout 1200 python bench.py > "$LOG/r4_agg_${AGG}.log" 2>&1
  echo "agg $AGG exit=$?" | tee -a "$LOG/r4_queue.log"
done

# 3. CSR arm of bench.py at HEAD (window hop default)
BENCH_CSR=1 timeout 1200 python bench.py > "$LOG/r4_csr_bench.log" 2>&1
echo "csr bench exit=$?" | tee -a "$LOG/r4_queue.log"

# 4. Pallas probe retry
timeout 180 python -c "from tpu_sage import kernels; print('probe:', kernels.probe())" \
  > "$LOG/r4_probe3.log" 2>&1
if grep -q "probe: True" "$LOG/r4_probe3.log"; then
  timeout 2400 python scripts/bench_kernels.py > "$LOG/r4_kernels.log" 2>&1
  echo "kernels exit=$?" | tee -a "$LOG/r4_queue.log"
else
  echo "pallas window closed (probe3)" | tee -a "$LOG/r4_queue.log"
fi
echo "=== measure_r4b done $(date -u +%FT%TZ) ===" | tee -a "$LOG/r4_queue.log"
