"""Can the pools' per-neighbor MLP hide under the gather streams? (round 5)

The roofline matrix (scripts/roofline_matrix.py) leaves mean_pool "open":
3.95 ms/step vs a 2.08 ms gather-saturation floor with ~196 GFLOP of MLP at
25% MXU stacked on top. mean's 9 GFLOP hides completely (16 us visible), so
SOME compute rides inside the gather kernels' stall cycles — the question is
whether the pools' 1-2 ms of matmul can, or whether the TensorCore's
sequential execution makes gather+MLP inherently additive beyond the
absorbable budget.

In-scan stages at the deepest-level shape (128,000 rows × 602, 10 chunks,
fanout 10, hidden 512):

  G   chunked gather only (fixed ids)
  M   per-chunk MLP+mean-pool on RESIDENT rows (no gather)
  GM  the shipped fused formulation: per-chunk gather → MLP → pool
  GI  G and M on INDEPENDENT buffers in one program (max overlap freedom)

GM ≈ max(G, M) → the fusion already overlaps (the open verdict closes as
"at the overlap limit"); GM ≈ G + M → sequential-core additivity — the
floor for pool aggregators is gather + compute, not max, and the matrix
rows close with that model.

    python scripts/bench_pool_overlap.py [--k 100] [--reps 3]
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

    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.ops import row_gather

    fanout, nc, hidden = 10, 10, 512
    n_roots = 12_800
    n = n_roots * fanout
    store = bench_store()
    feats = jnp.asarray(store.feats, jnp.bfloat16)
    d = feats.shape[1]

    rng = np.random.default_rng(0)
    ids_b = jnp.asarray(
        rng.integers(0, store.n_nodes, size=(K, n)), jnp.int32
    )
    # resident rows for the no-gather compute stage (one tree's worth)
    resident = jnp.asarray(
        rng.normal(size=(n, d)).astype(np.float32), jnp.bfloat16
    )
    w1 = jnp.asarray(rng.normal(size=(d, hidden)) * 0.05, jnp.bfloat16)

    cb = n_roots // nc

    def mlp_pool(rows, nb):
        h = jax.nn.relu(rows @ w1)
        return jnp.mean(h.reshape(nb, fanout, hidden), axis=1)

    def v_gather(f, ids, res):
        acc = jnp.float32(0.0)
        for j in range(nc):
            rows = row_gather(f, ids[j * cb * fanout:(j + 1) * cb * fanout],
                              form="plain")
            acc += jnp.sum(rows.astype(jnp.float32))
        return acc

    def v_mlp(f, ids, res):
        acc = jnp.float32(0.0)
        for j in range(nc):
            rows = res[j * cb * fanout:(j + 1) * cb * fanout]
            acc += jnp.sum(mlp_pool(rows, cb).astype(jnp.float32))
        return acc

    def v_fused(f, ids, res):
        acc = jnp.float32(0.0)
        for j in range(nc):
            rows = row_gather(f, ids[j * cb * fanout:(j + 1) * cb * fanout],
                              form="plain")
            acc += jnp.sum(mlp_pool(rows, cb).astype(jnp.float32))
        return acc

    def v_indep(f, ids, res):
        return v_gather(f, ids, res) + v_mlp(f, ids, res)

    def scan_over(body):
        @jax.jit
        def run(f, ids_b, res):
            def step(c, ids):
                return c + body(f, ids, res), None
            c, _ = jax.lax.scan(step, jnp.float32(0.0), ids_b)
            return c
        return run

    results = {}
    for name, body in [("G_gather", v_gather), ("M_mlp", v_mlp),
                       ("GM_fused", v_fused), ("GI_independent", v_indep)]:
        run = scan_over(body)
        c = run(feats, ids_b, resident); float(np.asarray(c))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            c = run(feats, ids_b, resident); float(np.asarray(c))
            ts.append((time.perf_counter() - t0) / K)
        results[name] = float(np.median(ts)) * 1e3
        print(json.dumps({"variant": name,
                          "ms_per_iter": round(results[name], 3)}), flush=True)

    g, m = results["G_gather"], results["M_mlp"]
    print(json.dumps({
        "sum_G_M": round(g + m, 3), "max_G_M": round(max(g, m), 3),
        "GM_fused": round(results["GM_fused"], 3),
        "GI_independent": round(results["GI_independent"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
