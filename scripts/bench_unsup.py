"""Unsupervised NCE throughput on the chip (single-tree step, round 2)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from tpu_sage.data.problem import NodeProblem
from tpu_sage.data.synthetic import bench_store
from tpu_sage.train.trainer import TrainConfig, build_model
from tpu_sage.train.unsupervised import UnsupConfig, UnsupervisedTrainer


def main():
    store = bench_store()
    problem = NodeProblem(store)
    cfg = TrainConfig(aggregator_class="mean", batch_size=512,
                      n_train_samples=(25, 10), n_val_samples=(25, 10),
                      output_dims=(128, 128), epochs=1,
                      compute_dtype="bfloat16")
    unsup = UnsupConfig(walk_length=3, n_negatives=10)
    spe = len(problem.folds["train"]) // 512
    model = build_model(cfg, problem.n_nodes, max(problem.n_classes, 2))
    tr = UnsupervisedTrainer(model, cfg, unsup, spe)
    graph = problem.device_graph(train=True, dtype=jnp.bfloat16)
    state = tr.init_state(graph)
    nsteps = int(os.environ.get("NSTEPS", 20))
    node_ids = jnp.asarray(problem.folds["train"][: nsteps * 512], jnp.int32)
    t0 = time.time()
    state, m = tr.train_epoch(state, graph, node_ids)
    float(m["loss"])
    print(json.dumps({"compile_s": round(time.time() - t0, 1)}), flush=True)
    for _ in range(3):
        t0 = time.time()
        state, m = tr.train_epoch(state, graph, node_ids)
        float(m["loss"])
        dt = time.time() - t0
        roots = 512 * (2 + 10)
        print(json.dumps({
            "ms_per_step": round(1000 * dt / nsteps, 2),
            "sampled_edges_per_sec": round(roots * 275 / (dt / nsteps), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
