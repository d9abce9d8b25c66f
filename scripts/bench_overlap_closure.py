"""Is the whole step one saturated descriptor-engine queue? (round 5)

The HEAD step breakdown (bench_logs/r5_breakdown.log) is exactly additive:
full step 2.25 ms = dispatch 0.125 + sampling 0.22 + model-form feature
gathers 1.90, with forward compute adding only ~15 us visible. Two readings
are possible:

(a) the sampling gathers (adjacency rows) and the feature gathers share ONE
    descriptor-issue engine that the 10-stream feature gather already
    saturates — additivity is forced, no schedule can do better; or
(b) XLA simply serializes the stages and an interleaved formulation could
    hide sampling under the feature streams (~0.22 ms/step = +10%).

Decide by measuring, in-scan (K iterations, median-of-reps):

  A  sampling only (both hops, real dependency chain)
  B  model-form feature gathers only (fixed precomputed level ids)
  C  A;B dependent — as in the real step (B consumes A's ids)
  D  A and B on INDEPENDENT inputs in one program — maximal overlap
     opportunity: XLA is free to run the adjacency gathers concurrently
     with the feature streams

D ~= max(A, B)  -> (b): the step formulation leaves ~A ms on the table.
D ~= A + B      -> (a): shared saturated engine; the step is closed at the
                   measured multi-stream descriptor rate.

    python scripts/bench_overlap_closure.py [--k 100] [--reps 3]
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
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    K = args.k

    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.ops import row_gather_chunked, row_gather_fanout_mean
    from tpu_sage.sample.csr import graph_sample_tree

    batch, fanouts, nc = 512, (25, 10), 10
    store = bench_store()
    problem = NodeProblem(store)
    graph = problem.device_graph(train=True, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    train_ids = problem.folds["train"]
    ids_b = jnp.asarray(rng.choice(train_ids, size=(K, batch)), jnp.int32)
    keys = jax.random.split(jax.random.key(0), K)
    # fixed level-id tables for the sampling-independent feature gathers:
    # same shapes/row-count as the real tree, drawn uniformly
    n1, n2 = batch * fanouts[0], batch * fanouts[0] * fanouts[1]
    fixed = [
        jnp.asarray(rng.integers(0, store.n_nodes, size=(K, n)), jnp.int32)
        for n in (batch, n1, n2)
    ]

    def feat_gathers(g, levels):
        acc = jnp.float32(0.0)
        for l in levels[:-1]:
            rows = row_gather_chunked(g.feats, l, form="plain", n_chunks=nc)
            acc += jnp.sum(rows.astype(jnp.float32))
        means = row_gather_fanout_mean(
            g.feats, levels[-1], fanouts[-1], form="plain", n_chunks=nc
        )
        return acc + jnp.sum(means.astype(jnp.float32))

    def v_sample(g, ids, key, f0, f1, f2):
        levels = graph_sample_tree(key, g, ids, fanouts)
        return jnp.sum(levels[-1]).astype(jnp.float32)

    def v_feats(g, ids, key, f0, f1, f2):
        return feat_gathers(g, [f0, f1, f2])

    def v_dependent(g, ids, key, f0, f1, f2):
        levels = graph_sample_tree(key, g, ids, fanouts)
        return feat_gathers(g, levels)

    def v_independent(g, ids, key, f0, f1, f2):
        levels = graph_sample_tree(key, g, ids, fanouts)
        return jnp.sum(levels[-1]).astype(jnp.float32) + feat_gathers(
            g, [f0, f1, f2]
        )

    def scan_over(body):
        @jax.jit
        def run(g, ids_b, keys, f0b, f1b, f2b):
            def step(c, xs):
                return c + body(g, *xs), None
            c, _ = jax.lax.scan(step, jnp.float32(0.0),
                                (ids_b, keys, f0b, f1b, f2b))
            return c
        return run

    results = {}
    for name, body in [("A_sample", v_sample), ("B_feats", v_feats),
                       ("C_dependent", v_dependent),
                       ("D_independent", v_independent)]:
        run = scan_over(body)
        c = run(graph, ids_b, keys, *fixed); float(np.asarray(c))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            c = run(graph, ids_b, keys, *fixed); float(np.asarray(c))
            ts.append((time.perf_counter() - t0) / K)
        results[name] = float(np.median(ts)) * 1e3
        print(json.dumps({"variant": name,
                          "ms_per_iter": round(results[name], 3)}), flush=True)

    a, b = results["A_sample"], results["B_feats"]
    d = results["D_independent"]
    print(json.dumps({
        "sum_A_B": round(a + b, 3), "max_A_B": round(max(a, b), 3),
        "D": round(d, 3),
        "verdict": ("shared saturated engine (additive — step closed)"
                    if d > 0.5 * (a + b) + 0.5 * max(a, b)
                    else "overlappable — interleave sampling with feature streams"),
    }), flush=True)


if __name__ == "__main__":
    main()
