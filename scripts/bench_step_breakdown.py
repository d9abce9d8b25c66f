"""Where do the 4.31 ms/step go? Component breakdown inside the epoch scan.

Times nested prefixes of the training step (sample -> feature gather ->
forward -> backward -> full update), each as its own K-iteration jit'd
``lax.scan`` on the Reddit-shaped bench config. Stage cost = delta between
consecutive rows; every program carries the flat per-dispatch tax (~26 ms,
measured via the empty row) which at K=100 adds 0.26 ms/iter to ALL rows
equally and cancels in the deltas.

Each prefix ends in a scalar accumulation to defeat DCE; for the gather row
that forcing reduce reads the gathered rows once (~0.2 ms upper bound),
which slightly overstates "gather" and understates "forward" — noted in
RESULTS.md where the numbers land.

    python scripts/bench_step_breakdown.py [--k 100] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# (sys.path, not PYTHONPATH: the env var interferes with axon PJRT plugin
# discovery at interpreter start)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    K = args.k

    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.sample.csr import graph_sample_tree
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

    batch_size, fanouts = 512, (25, 10)
    store = bench_store()
    problem = NodeProblem(store)
    config = TrainConfig(
        batch_size=batch_size, n_train_samples=fanouts, n_val_samples=fanouts,
        output_dims=(128, 128), epochs=1, compute_dtype="bfloat16",
    )
    model = build_model(config, problem.n_nodes, problem.n_classes)
    trainer = Trainer(model, config, K, task=problem.task)
    graph = problem.device_graph(train=True, dtype=jnp.bfloat16)
    state = trainer.init_state(graph)

    rng = np.random.default_rng(0)
    train_ids = problem.folds["train"]
    ids_b = jnp.asarray(
        rng.choice(train_ids, size=(K, batch_size)), jnp.int32
    )
    tgt_b = jnp.asarray(store.targets[np.asarray(ids_b).ravel()]
                        ).reshape(K, batch_size)
    keys = jax.random.split(jax.random.key(0), K)
    params = state.params

    def scan_over(body):
        @jax.jit
        def run(params, graph, ids_b, tgt_b, keys):
            def step(c, xs):
                return c + body(params, graph, *xs), None
            c, _ = jax.lax.scan(step, jnp.float32(0.0), (ids_b, tgt_b, keys))
            return c
        return run

    fo = model.fanouts(train=True)

    def v_empty(params, graph, ids, tgt, key):
        return jnp.sum(ids).astype(jnp.float32) * 0

    def v_sample(params, graph, ids, tgt, key):
        levels = graph_sample_tree(key, graph, ids, fo)
        return jnp.sum(levels[-1]).astype(jnp.float32)

    def v_gather(params, graph, ids, tgt, key):
        levels = graph_sample_tree(key, graph, ids, fo)
        acc = jnp.float32(0.0)
        for l in levels:
            acc += jnp.sum(graph.feats[l].astype(jnp.float32))
        return acc

    # The model's ACTUAL gather formulation at HEAD (round-5 addition): the
    # non-deepest levels through chunked plain row gathers, the deepest level
    # through the fused gather+fanout-mean (nn/model.py::encode defaults:
    # form="plain", gather_chunks=10, fuse_last on). The plain per-level
    # v_gather above predates the fused path and overstates the stage — it
    # materializes the 128k raw deepest-level rows the model never does.
    def v_gather_model(params, graph, ids, tgt, key):
        from tpu_sage.ops import row_gather_chunked, row_gather_fanout_mean

        levels = graph_sample_tree(key, graph, ids, fo)
        nc = config.gather_chunks or 10
        acc = jnp.float32(0.0)
        for l in levels[:-1]:
            rows = row_gather_chunked(graph.feats, l, form="plain", n_chunks=nc)
            acc += jnp.sum(rows.astype(jnp.float32))
        fanout = levels[-1].shape[0] // levels[-2].shape[0]
        means = row_gather_fanout_mean(
            graph.feats, levels[-1], fanout, form="plain", n_chunks=nc
        )
        return acc + jnp.sum(means.astype(jnp.float32))

    def v_forward(params, graph, ids, tgt, key):
        levels = graph_sample_tree(key, graph, ids, fo)
        logits = model.apply(params, levels, graph.feats)
        return jnp.sum(logits.astype(jnp.float32))

    def v_backward(params, graph, ids, tgt, key):
        def loss_of(p):
            levels = graph_sample_tree(key, graph, ids, fo)
            logits = model.apply(p, levels, graph.feats)
            return trainer.loss_fn(logits, tgt)
        loss, grads = jax.value_and_grad(loss_of)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        return loss + sum(jnp.sum(g).astype(jnp.float32) for g in leaves)

    variants = [
        ("empty", v_empty), ("sample", v_sample), ("gather", v_gather),
        ("gather_model", v_gather_model),
        ("forward", v_forward), ("backward", v_backward),
    ]

    results = {}
    for name, body in variants:
        run = scan_over(body)
        c = run(params, graph, ids_b, tgt_b, keys); float(np.asarray(c))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            c = run(params, graph, ids_b, tgt_b, keys); float(np.asarray(c))
            ts.append((time.perf_counter() - t0) / K)
        results[name] = float(np.median(ts))
        print(json.dumps({"variant": name,
                          "ms_per_iter": round(results[name] * 1e3, 3)}),
              flush=True)

    # full update path: the real train_epoch on the same K batches
    state2, m = trainer.train_epoch(state, graph, ids_b.reshape(-1),
                                    tgt_b.reshape(-1))
    float(m["loss"])
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        state2, m = trainer.train_epoch(state2, graph, ids_b.reshape(-1),
                                        tgt_b.reshape(-1))
        float(m["loss"])
        ts.append((time.perf_counter() - t0) / K)
    results["full_step"] = float(np.median(ts))
    print(json.dumps({"variant": "full_step",
                      "ms_per_iter": round(results["full_step"] * 1e3, 3)}),
          flush=True)

    # The model-true prefix chain (the legacy raw-row "gather" variant is
    # reported above but kept out of the deltas — the model never
    # materializes the deepest level's raw rows since round 2f).
    prev = 0.0
    for name in ["empty", "sample", "gather_model", "forward", "backward",
                 "full_step"]:
        ms = results[name] * 1e3
        print(json.dumps({"stage": name, "cum_ms": round(ms, 3),
                          "delta_ms": round(ms - prev, 3)}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
