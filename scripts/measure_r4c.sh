#!/bin/bash
# Round-4 queue #3: partitioned-CSR at headline scale; probe retry.
set -u
LOG=${1:-bench_logs}
cd "$(dirname "$0")/.."
echo "=== measure_r4c start $(date -u +%FT%TZ) ===" | tee -a "$LOG/r4_queue.log"

timeout 3000 python - > "$LOG/r4_csr_partitioned.log" 2>&1 <<'EOF'
import json, os, sys, time
sys.path.insert(0, os.getcwd())
import jax
from tpu_sage.data.problem import NodeProblem
from tpu_sage.data.synthetic import bench_store
from tpu_sage.dist.mesh import make_mesh
from tpu_sage.dist.train import PartitionedTrainer
from tpu_sage.train.trainer import TrainConfig

store = bench_store()
mesh = make_mesh()
for csr in (True, False):
    cfg = TrainConfig(batch_size=512, n_train_samples=(25, 10),
                      n_val_samples=(25, 10), output_dims=(128, 128),
                      compute_dtype="bfloat16")
    tr, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
        store, cfg, mesh, csr=csr)
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
    edges = 512 * 275
    print(json.dumps({"config": "partitioned_1chip_headline",
                      "csr": csr, "halo_chunks": 10,
                      "ms_per_step": round(1e3 * dt, 3),
                      "edges_per_sec": round(edges / dt, 1)}), flush=True)
EOF
echo "csr-part exit=$?" | tee -a "$LOG/r4_queue.log"

timeout 180 python -c "from tpu_sage import kernels; print('probe:', kernels.probe())" \
  > "$LOG/r4_probe4.log" 2>&1
if grep -q "probe: True" "$LOG/r4_probe4.log"; then
  timeout 2400 python scripts/bench_kernels.py > "$LOG/r4_kernels.log" 2>&1
  echo "kernels exit=$?" | tee -a "$LOG/r4_queue.log"
else
  echo "pallas window closed (probe4)" | tee -a "$LOG/r4_queue.log"
fi
echo "=== measure_r4c done $(date -u +%FT%TZ) ===" | tee -a "$LOG/r4_queue.log"
