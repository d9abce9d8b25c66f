"""masked_chunked chunk-count sweep for the unsup workload (round 5).

The whole-step A/B found masked_chunked@48 at 31.84 ms (53.1M
sampled-edges/s, +8.9% over the shipped masked@24 — the L1 level's single
serial 153,600-row descriptor stream splits into overlapping chunks).
Sweep the neighborhood; divisors of the deepest level's 153,600 roots.

    python scripts/bench_unsup_chunk_sweep.py [--k 30] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunks", default="32,48,64,96,128")
    args = ap.parse_args()
    K = args.k

    import jax.numpy as jnp

    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.train.trainer import TrainConfig, build_model
    from tpu_sage.train.unsupervised import UnsupConfig, UnsupervisedTrainer

    batch, fanouts = 512, (25, 10)
    unsup = UnsupConfig(walk_length=3, n_negatives=10)
    store = bench_store()
    problem = NodeProblem(store)
    rng = np.random.default_rng(0)
    node_ids = jnp.asarray(
        rng.choice(problem.folds["train"], size=K * batch), jnp.int32
    )
    edges = batch * 12 * (fanouts[0] + fanouts[0] * fanouts[1])
    for chunks in (int(c) for c in args.chunks.split(",")):
        config = TrainConfig(
            batch_size=batch, n_train_samples=fanouts, n_val_samples=fanouts,
            output_dims=(128, 128), compute_dtype="bfloat16",
            gather_form="masked_chunked", gather_chunks=chunks,
        )
        model = build_model(config, problem.n_nodes, problem.n_classes)
        trainer = UnsupervisedTrainer(model, config, unsup, K)
        graph = problem.device_graph(train=True, dtype=jnp.bfloat16)
        state = trainer.init_state(graph)
        state, m = trainer.train_epoch(state, graph, node_ids)
        float(m["loss"])
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, m = trainer.train_epoch(state, graph, node_ids)
            float(m["loss"])
            ts.append((time.perf_counter() - t0) / K)
        dt = float(np.median(ts))
        print(json.dumps({"arm": f"maskedchunk{chunks}",
                          "ms_per_step": round(dt * 1e3, 3),
                          "sampled_edges_per_sec": round(edges / dt, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
