"""Unsup gather-formulation A/B at the NCE tree shapes (round 5).

The r5 stage breakdown puts the unsup feature gathers at 28.05 ms =
16.5 ns/row — above the 13.4 ns/row multi-stream saturation the supervised
path achieves. Two suspects the r4 whole-program form×chunks grid could not
separate: (a) the masked form keeps the 153,600-row L1 gather UNCHUNKED
(one serial descriptor stream), and (b) the deepest fused fanout-mean runs
masked (materialize-then-mean) where the supervised path's plain form
reached saturation. This A/Bs the gather stage alone (sampling + feature
formulation, in-scan) across mixed per-level forms the product grid never
tested:

  shipped         masked L1 unchunked + masked fused deepest @24
  l1chunk         masked L1 CHUNKED @24 + masked fused deepest @24
  l1chunk_plain   plain L1 chunked @24 + masked fused deepest @24
  deep_plain      masked L1 unchunked + PLAIN fused deepest @24
  mixed           plain L1 chunked @24 + plain fused deepest @24
  mixed48         plain L1 chunked @24 + plain fused deepest @48

    python scripts/bench_unsup_gather_ab.py [--k 30] [--reps 3]
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
    from tpu_sage.ops import (row_gather, row_gather_chunked,
                              row_gather_fanout_mean)
    from tpu_sage.sample.csr import graph_sample_tree
    from tpu_sage.train.unsupervised import graph_random_walk

    batch, fanouts, q, wl = 512, (25, 10), 10, 3
    store = bench_store()
    problem = NodeProblem(store)
    graph = problem.device_graph(train=True, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    train_ids = problem.folds["train"]
    ids_b = jnp.asarray(rng.choice(train_ids, size=(K, batch)), jnp.int32)
    keys = jax.random.split(jax.random.key(0), K)

    def make_levels(g, ids, key):
        k_walk, k_neg, k_tree = jax.random.split(key, 3)
        pos = graph_random_walk(k_walk, g, ids, wl)
        neg = jax.random.randint(
            k_neg, (batch * q,), 0, g.n_nodes).astype(jnp.int32)
        roots = jnp.concatenate([ids, pos, neg])
        return graph_sample_tree(k_tree, g, roots, fanouts)

    def arm(l1_mode, deep_form, deep_chunks):
        def body(g, ids, key):
            levels = make_levels(g, ids, key)
            acc = jnp.float32(0.0)
            # L0 (6,144 roots) always one gather — too small to matter
            acc += jnp.sum(row_gather(g.feats, levels[0], form="masked")
                           .astype(jnp.float32))
            if l1_mode == "masked_one":
                r1 = row_gather(g.feats, levels[1], form="masked")
            elif l1_mode == "masked_chunked":
                r1 = row_gather_chunked(g.feats, levels[1], form="masked",
                                        n_chunks=24)
            else:
                r1 = row_gather_chunked(g.feats, levels[1], form="plain",
                                        n_chunks=24)
            acc += jnp.sum(r1.astype(jnp.float32))
            means = row_gather_fanout_mean(
                g.feats, levels[-1], fanouts[-1], form=deep_form,
                n_chunks=deep_chunks,
            )
            return acc + jnp.sum(means.astype(jnp.float32))
        return body

    arms = {
        "shipped": arm("masked_one", "masked", 24),
        "l1chunk": arm("masked_chunked", "masked", 24),
        "l1chunk_plain": arm("plain_chunked", "masked", 24),
        "deep_plain": arm("masked_one", "plain", 24),
        "mixed": arm("plain_chunked", "plain", 24),
        "mixed48": arm("plain_chunked", "plain", 48),
    }

    def scan_over(body):
        @jax.jit
        def run(g, ids_b, keys):
            def step(c, xs):
                return c + body(g, *xs), None
            c, _ = jax.lax.scan(step, jnp.float32(0.0), (ids_b, keys))
            return c
        return run

    for name, body in arms.items():
        run = scan_over(body)
        c = run(graph, ids_b, keys); float(np.asarray(c))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            c = run(graph, ids_b, keys); float(np.asarray(c))
            ts.append((time.perf_counter() - t0) / K)
        print(json.dumps({"arm": name,
                          "ms_per_iter": round(float(np.median(ts)) * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
