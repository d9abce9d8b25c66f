"""Where do the 34.7 ms of the unsupervised NCE step go? (VERDICT r4 #2)

Nested-prefix stage breakdown of the NCE train step at the per-workload
defaults (masked@24, fuse_last auto) on the Reddit-shaped bench config:
walk positives → shared-tree sampling (6,144 roots × (25,10)) → the model's
actual gather formulation (unchunked masked gathers for levels 0-1, fused
masked fanout-mean ×24 chunks for the 1.54M-row deepest level) → encoder →
NCE loss → backward → full scanned step. Stage cost = delta between
consecutive rows; every row carries the flat per-dispatch tax equally.

    python scripts/bench_unsup_breakdown.py [--k 30] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    K = args.k

    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.ops import row_gather, row_gather_fanout_mean
    from tpu_sage.sample.csr import graph_sample_tree
    from tpu_sage.train.trainer import TrainConfig, build_model
    from tpu_sage.train.unsupervised import (UnsupConfig, UnsupervisedTrainer,
                                             graph_random_walk, nce_loss,
                                             unsup_gather_defaults)

    batch, fanouts = 512, (25, 10)
    unsup = UnsupConfig(walk_length=3, n_negatives=10)
    store = bench_store()
    problem = NodeProblem(store)
    config = unsup_gather_defaults(TrainConfig(
        batch_size=batch, n_train_samples=fanouts, n_val_samples=fanouts,
        output_dims=(128, 128), epochs=1, compute_dtype="bfloat16",
    ))
    print(json.dumps({"gather_form": config.gather_form,
                      "gather_chunks": config.gather_chunks}), flush=True)
    model = build_model(config, problem.n_nodes, problem.n_classes)
    trainer = UnsupervisedTrainer(model, config, unsup, K)
    graph = problem.device_graph(train=True, dtype=jnp.bfloat16)
    state = trainer.init_state(graph)
    params = state.params

    rng = np.random.default_rng(0)
    train_ids = problem.folds["train"]
    ids_b = jnp.asarray(rng.choice(train_ids, size=(K, batch)), jnp.int32)
    keys = jax.random.split(jax.random.key(0), K)
    q = unsup.n_negatives
    form, nc = config.gather_form, config.gather_chunks

    # graph rides as a jit ARGUMENT everywhere (a closure capture would
    # inline the 280 MB feature table as an HLO constant and blow the axon
    # remote_compile request-size limit — hit by the round-5 overlap script)
    def make_roots(g, ids, key):
        k_walk, k_neg, k_tree = jax.random.split(key, 3)
        pos = graph_random_walk(k_walk, g, ids, unsup.walk_length)
        neg = jax.random.randint(
            k_neg, (batch * q,), 0, g.n_nodes).astype(jnp.int32)
        return jnp.concatenate([ids, pos, neg]), k_tree

    def v_empty(params, g, ids, key):
        return jnp.sum(ids).astype(jnp.float32) * 0

    def v_walk(params, g, ids, key):
        roots, _ = make_roots(g, ids, key)
        return jnp.sum(roots).astype(jnp.float32)

    def v_sample(params, g, ids, key):
        roots, k_tree = make_roots(g, ids, key)
        levels = graph_sample_tree(k_tree, g, roots, fanouts)
        return jnp.sum(levels[-1]).astype(jnp.float32)

    def v_gather_model(params, g, ids, key):
        # the encode() formulation at the unsup defaults: masked form keeps
        # ONE unchunked gather per non-deepest level (nn/model.py::encode);
        # the deepest level goes through the fused masked fanout-mean
        roots, k_tree = make_roots(g, ids, key)
        levels = graph_sample_tree(k_tree, g, roots, fanouts)
        acc = jnp.float32(0.0)
        for l in levels[:-1]:
            acc += jnp.sum(row_gather(g.feats, l, form=form)
                           .astype(jnp.float32))
        means = row_gather_fanout_mean(
            g.feats, levels[-1], fanouts[-1], form=form, n_chunks=nc
        )
        return acc + jnp.sum(means.astype(jnp.float32))

    def v_encode(params, g, ids, key):
        roots, k_tree = make_roots(g, ids, key)
        levels = graph_sample_tree(k_tree, g, roots, fanouts)
        z = model.apply(params, levels, g.feats, method=model.encode)
        return jnp.sum(z.astype(jnp.float32))

    def v_nce(params, g, ids, key):
        roots, k_tree = make_roots(g, ids, key)
        levels = graph_sample_tree(k_tree, g, roots, fanouts)
        z = model.apply(params, levels, g.feats, method=model.encode)
        z_u, z_p = z[:batch], z[batch : 2 * batch]
        z_n = z[2 * batch :].reshape(batch, q, -1)
        return nce_loss(z_u, z_p, z_n)

    def v_backward(params, g, ids, key):
        def loss_of(p):
            return v_nce(p, g, ids, key)
        loss, grads = jax.value_and_grad(loss_of)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        return loss + sum(jnp.sum(g_).astype(jnp.float32) for g_ in leaves)

    def scan_over(body):
        @jax.jit
        def run(params, g, ids_b, keys):
            def step(c, xs):
                return c + body(params, g, *xs), None
            c, _ = jax.lax.scan(step, jnp.float32(0.0), (ids_b, keys))
            return c
        return run

    variants = [
        ("empty", v_empty), ("walk", v_walk), ("sample", v_sample),
        ("gather_model", v_gather_model), ("encode", v_encode),
        ("nce", v_nce), ("backward", v_backward),
    ]
    results = {}
    for name, body in variants:
        run = scan_over(body)
        c = run(params, graph, ids_b, keys); float(np.asarray(c))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            c = run(params, graph, ids_b, keys); float(np.asarray(c))
            ts.append((time.perf_counter() - t0) / K)
        results[name] = float(np.median(ts))
        print(json.dumps({"variant": name,
                          "ms_per_iter": round(results[name] * 1e3, 3)}),
              flush=True)

    # the real scanned epoch on the same batches
    state2, m = trainer.train_epoch(state, graph, ids_b.reshape(-1))
    float(m["loss"])
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        state2, m = trainer.train_epoch(state2, graph, ids_b.reshape(-1))
        float(m["loss"])
        ts.append((time.perf_counter() - t0) / K)
    results["full_step"] = float(np.median(ts))
    print(json.dumps({"variant": "full_step",
                      "ms_per_iter": round(results["full_step"] * 1e3, 3)}),
          flush=True)

    prev = 0.0
    for name in ["empty", "walk", "sample", "gather_model", "encode", "nce",
                 "backward", "full_step"]:
        ms = results[name] * 1e3
        print(json.dumps({"stage": name, "cum_ms": round(ms, 3),
                          "delta_ms": round(ms - prev, 3)}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
