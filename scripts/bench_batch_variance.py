"""Batch-size variance investigation (VERDICT round-1 weak #3).

Round 1 measured the IDENTICAL batch-1024 program at 60.6M edges/s in one
session and ~31M in another; "tunnel-state variance" was a hypothesis. This
script settles it by alternating batch-512 and batch-1024 epochs
back-to-back in ONE session — if 1024 is fast in the same session where 512
is normal, the variance is cross-session (tunnel state); if 1024 is slow
here too, the 60.6M reading was the outlier.

Usage: python scripts/bench_batch_variance.py   (TPU; prints JSONL)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# (sys.path, not PYTHONPATH: the env var interferes with axon PJRT plugin
# discovery at interpreter start)

import jax.numpy as jnp

from tpu_sage.data.problem import NodeProblem
from tpu_sage.data.synthetic import bench_store
from tpu_sage.train.trainer import TrainConfig, Trainer, build_model


def make(problem, store, batch_size):
    fanouts = (25, 10)
    config = TrainConfig(
        aggregator_class="mean", batch_size=batch_size, n_train_samples=fanouts,
        n_val_samples=fanouts, output_dims=(128, 128), epochs=3,
        lr_init=0.01, compute_dtype="bfloat16",
    )
    train_ids = problem.folds["train"]
    spe = len(train_ids) // batch_size
    model = build_model(config, problem.n_nodes, problem.n_classes)
    trainer = Trainer(model, config, spe, task=problem.task)
    graph = problem.device_graph(train=True, dtype=jnp.bfloat16)
    state = trainer.init_state(graph)
    n = spe * batch_size
    fold_ids = jnp.asarray(train_ids[:n], jnp.int32)
    fold_tgt = jnp.asarray(store.targets[train_ids[:n]])
    return trainer, state, graph, fold_ids, fold_tgt, spe


def main():
    store = bench_store()
    problem = NodeProblem(store)
    setups = {b: make(problem, store, b) for b in (512, 1024)}

    # compile + warm both programs first
    states = {}
    for b, (tr, st, g, fi, ft, spe) in setups.items():
        st, m = tr.train_epoch(st, g, fi, ft)
        float(m["loss"])
        states[b] = st

    for rnd in range(4):
        for b in (512, 1024):
            tr, _, g, fi, ft, spe = setups[b]
            t0 = time.perf_counter()
            states[b], m = tr.train_epoch(states[b], g, fi, ft)
            float(m["loss"])
            dt = time.perf_counter() - t0
            edges = spe * b * (25 + 250)
            print(json.dumps({
                "round": rnd, "batch": b,
                "ms_per_step": round(1000 * dt / spe, 3),
                "edges_per_sec": round(edges / dt, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
