"""Unsupervised NCE knob sweep + roofline inputs (VERDICT round-3 #4).

Round 3 gave the supervised path a descriptor roofline (7 ns/row intercept →
143M edges/s ceiling, running at 42%) but the NCE tree only got a 4-corner
A/B. This sweeps gather_form × gather_chunks (snapped) and fuse_last at the
NCE tree's own shape — (2+Q)·b = 6,144 roots × fanout (25,10) → 1,695,744
feature rows/step, 12× the supervised tree — so the per-workload defaults
rest on a real sweep, and the %-of-floor number can be stated.

Run on the real chip: python scripts/bench_unsup_sweep.py
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(cfg, problem, store, nsteps):
    from tpu_sage.train.trainer import build_model
    from tpu_sage.train.unsupervised import UnsupConfig, UnsupervisedTrainer

    unsup = UnsupConfig(walk_length=3, n_negatives=10)
    spe = len(problem.folds["train"]) // cfg.batch_size
    model = build_model(cfg, problem.n_nodes, max(problem.n_classes, 2))
    tr = UnsupervisedTrainer(model, cfg, unsup, spe)
    graph = problem.device_graph(train=True, dtype=jnp.bfloat16)
    state = tr.init_state(graph)
    node_ids = jnp.asarray(problem.folds["train"][: nsteps * cfg.batch_size],
                           jnp.int32)
    state, m = tr.train_epoch(state, graph, node_ids)
    float(m["loss"])  # compile + sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = tr.train_epoch(state, graph, node_ids)
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1] / nsteps
    roots = cfg.batch_size * (2 + unsup.n_negatives)
    edges = roots * (25 + 250)
    return 1e3 * dt, edges / dt


def main():
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.train.trainer import TrainConfig

    nsteps = int(os.environ.get("NSTEPS", 30))
    store = bench_store()
    problem = NodeProblem(store)
    base = TrainConfig(aggregator_class="mean", batch_size=512,
                       n_train_samples=(25, 10), n_val_samples=(25, 10),
                       output_dims=(128, 128), epochs=1,
                       compute_dtype="bfloat16")
    print(json.dumps({"platform": jax.devices()[0].platform,
                      "nsteps": nsteps}), flush=True)

    grid = list(itertools.product(
        ("masked", "plain"), (6, 8, 12, 16, 24, 32)))
    results = {}
    for form, chunks in grid:
        cfg = base.replace(gather_form=form, gather_chunks=chunks)
        ms, eps = measure(cfg, problem, store, nsteps)
        results[(form, chunks)] = eps
        print(json.dumps({"form": form, "chunks": chunks,
                          "ms_per_step": round(ms, 2),
                          "sampled_edges_per_sec": round(eps, 1)}), flush=True)

    best = max(results, key=results.get)
    print(json.dumps({"best": list(best),
                      "edges_per_sec": round(results[best], 1)}), flush=True)
    # fuse_last off at the winner (the 4-corner r3 matrix never varied it)
    cfg = base.replace(gather_form=best[0], gather_chunks=best[1],
                       fuse_last="off")
    ms, eps = measure(cfg, problem, store, nsteps)
    print(json.dumps({"form": best[0], "chunks": best[1], "fuse_last": "off",
                      "ms_per_step": round(ms, 2),
                      "sampled_edges_per_sec": round(eps, 1)}), flush=True)


if __name__ == "__main__":
    main()
