"""Whole-step unsup A/B over the round-5 mixed gather forms.

The stage-level A/B (bench_unsup_gather_ab.py) ranks pure gather rates, but
the r2c/2d lesson is that the form also changes the CONSUMER matmuls'
lowering (plain fuses into them, masked materializes) — only whole-step
numbers decide. Arms over (gather_form, gather_form_deep) at chunks=24
through the REAL scanned NCE epoch:

    python scripts/bench_unsup_whole_ab.py [--k 30] [--reps 3]
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

    arms = [
        ("shipped_masked24", "masked", None, 24),
        ("maskedchunk24", "masked_chunked", None, 24),
        ("maskedchunk24_deepplain", "masked_chunked", "plain", 24),
        ("masked24_deepplain", "masked", "plain", 24),
        ("maskedchunk48", "masked_chunked", None, 48),
    ]
    for name, form, deep, chunks in arms:
        config = TrainConfig(
            batch_size=batch, n_train_samples=fanouts, n_val_samples=fanouts,
            output_dims=(128, 128), compute_dtype="bfloat16",
            gather_form=form, gather_form_deep=deep, gather_chunks=chunks,
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
        print(json.dumps({"arm": name, "ms_per_step": round(dt * 1e3, 3),
                          "sampled_edges_per_sec": round(edges / dt, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
