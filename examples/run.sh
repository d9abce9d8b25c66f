#!/usr/bin/env bash
# Smoke-run script (reference counterpart: run.sh, the de-facto test —
# SURVEY.md §4.1). No network in this environment, so the "download example
# data" step becomes generating a synthetic problem.h5 via our ETL, then the
# canonical supervised + unsupervised invocations.
set -euo pipefail
cd "$(dirname "$0")/.."

if [ -z "${USE_TPU:-}" ]; then
  # default: CPU (clear the axon trigger); set USE_TPU=1 to keep the TPU env
  export PALLAS_AXON_POOL_IPS="" JAX_PLATFORMS=cpu
fi

OUT=${OUT:-/tmp/tpu_sage_example}
mkdir -p "$OUT"

python - <<EOF
from tpu_sage.data.synthetic import sbm_store
from tpu_sage.data.convert import save_problem_h5
# centroid_seed pins the class->feature mapping so the cross-graph
# inductive leg below can draw a DISJOINT graph from the same process
save_problem_h5(sbm_store(n_nodes=2708, n_classes=7, feat_dim=64, seed=0,
                          centroid_seed=7),
                "$OUT/problem.h5")
print("wrote $OUT/problem.h5")
EOF

echo "== supervised (cora-style mean) =="
python -m tpu_sage.cli --problem-path "$OUT/problem.h5" \
  --aggregator-class mean --n-train-samples 25,10 --n-val-samples 25,10 \
  --batch-size 256 --epochs 5 --lr-init 0.01 \
  --checkpoint-path "$OUT/model.npz"

echo "== unsupervised (skip-gram neg-sampling) =="
python -m tpu_sage.cli --problem-path "$OUT/problem.h5" \
  --aggregator-class mean --n-train-samples 10,5 --n-val-samples 10,5 \
  --batch-size 256 --epochs 3 --unsupervised

echo "== partitioned (node-sharded mesh over all visible devices) =="
python -m tpu_sage.cli --problem-path "$OUT/problem.h5" \
  --aggregator-class mean --n-train-samples 10,5 --n-val-samples 10,5 \
  --batch-size 256 --epochs 3 --partitioned \
  --checkpoint-path "$OUT/part.npz" --checkpoint-every 1

echo "== partitioned unsupervised (halo-walked NCE) =="
python -m tpu_sage.cli --problem-path "$OUT/problem.h5" \
  --aggregator-class mean --n-train-samples 10,5 --n-val-samples 10,5 \
  --batch-size 256 --epochs 2 --partitioned --unsupervised

echo "== exact full-graph validation + serving export =="
python -m tpu_sage.cli --problem-path "$OUT/problem.h5" \
  --aggregator-class mean --n-train-samples 10,5 --n-val-samples 25,10 \
  --batch-size 256 --epochs 2 --exact-val \
  --checkpoint-path "$OUT/exact.npz"
python -m tpu_sage.export --problem-path "$OUT/problem.h5" \
  --checkpoint "$OUT/exact.npz" --out "$OUT/embeddings.npy" \
  --n-train-samples 10,5 --n-val-samples 25,10 \
  --out-dtype float16  # halves fetch + artifact (RESULTS r5 §8b)

echo "== hierarchical (host, chip) halo on a 2-D mesh =="
python -m tpu_sage.cli --problem-path "$OUT/problem.h5" \
  --aggregator-class mean --n-train-samples 10,5 --n-val-samples 10,5 \
  --batch-size 256 --epochs 2 --partitioned --halo hier2d

echo "== cross-graph inductive inference (train on A, classify DISJOINT B) =="
python - <<EOF
from tpu_sage.data.synthetic import sbm_store
from tpu_sage.data.convert import save_problem_h5
# same generative process (centroid_seed=7), every node/edge/size different
save_problem_h5(sbm_store(n_nodes=4000, n_classes=7, feat_dim=64, seed=1,
                          centroid_seed=7),
                "$OUT/problem_b.h5")
print("wrote $OUT/problem_b.h5")
EOF
python -m tpu_sage.export --problem-path "$OUT/problem_b.h5" \
  --checkpoint "$OUT/model.npz" --checkpoint-config \
  --out "$OUT/b_logits.npy" --logits
python - <<EOF
import numpy as np, h5py
with h5py.File("$OUT/problem_b.h5") as f:
    targets = f["targets"][:]
acc = float((np.load("$OUT/b_logits.npy").argmax(-1) == targets).mean())
print({"cross_graph_accuracy_on_B": acc, "chance": 1 / 7})
assert acc > 2 / 7, "cross-graph transfer failed"
EOF

echo "== memory-lean CSR adjacency: single-device and partitioned =="
python -m tpu_sage.cli --problem-path "$OUT/problem.h5" \
  --aggregator-class mean --n-train-samples 10,5 --n-val-samples 10,5 \
  --batch-size 256 --epochs 2 --csr-adjacency
python -m tpu_sage.cli --problem-path "$OUT/problem.h5" \
  --aggregator-class mean --n-train-samples 10,5 --n-val-samples 10,5 \
  --batch-size 256 --epochs 2 --csr-adjacency --partitioned
