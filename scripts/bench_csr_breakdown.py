"""CSR penalty breakdown + window-hop A/B (VERDICT round-3 #5).

Round 3 left CSR at 34.2M vs the dense path's 62.2M with no split of where
the penalty lives. This measures, at the headline config (232,965 nodes,
batch 512, fanout (25,10), bf16):

1. sampling-stage-only cost, dense vs CSR-element vs CSR-window (in-scan,
   the per-hop descriptor story in isolation);
2. whole-step training throughput for the same three storages.

The window hop (sample/csr.py::uniform_neighbor_sample_csr_window) gathers
each frontier node's contiguous CSR row span in ONE descriptor instead of
fanout element descriptors — if the round-3 roofline (7 ns/descriptor) is
right, the deepest hop drops from ~128k to ~12.8k descriptors and CSR
sampling should land at the dense row-gather's cost.

Run on the real chip: python scripts/bench_csr_breakdown.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_scan(fn, xs, repeats=3):
    """Median total-seconds of a K-iteration scan over keys."""
    out = jax.jit(lambda keys: jax.lax.scan(
        lambda c, k: (c, fn(k)), 0, keys)[1])
    r = out(xs)
    jax.block_until_ready(r)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(out(xs))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.sample.csr import sample_tree_csr
    from tpu_sage.sample.sampler import sample_tree

    K = int(os.environ.get("K", 100))
    B = 512
    fanouts = (25, 10)
    store = bench_store()
    problem = NodeProblem(store)
    dense = problem.device_graph(train=True, dtype=jnp.bfloat16)
    csr = problem.device_graph(train=True, csr=True, dtype=jnp.bfloat16)
    csr_elem = dataclasses.replace(csr, window=0)
    ids = jnp.arange(B, dtype=jnp.int32) * 7
    keys = jax.random.split(jax.random.key(0), K)
    print(json.dumps({"platform": jax.devices()[0].platform, "K": K,
                      "window": csr.window,
                      "nnz": int(csr.indices.shape[0])}), flush=True)

    def stage(label, fn):
        dt = time_scan(fn, keys)
        print(json.dumps({"stage": label,
                          "ms_per_iter": round(1e3 * dt / K, 3)}), flush=True)

    # 1. sampling stage only (sum the deepest level so the scan has output)
    stage("sample_dense", lambda k: sample_tree(
        k, dense.adj, dense.degrees, ids, fanouts)[-1].sum())
    stage("sample_csr_element", lambda k: sample_tree_csr(
        k, csr.indptr, csr.indices, csr.degrees, ids, fanouts,
        window=0)[-1].sum())
    stage("sample_csr_window", lambda k: sample_tree_csr(
        k, csr.indptr, csr.indices, csr.degrees, ids, fanouts,
        window=csr.window)[-1].sum())

    # 2. whole training step via bench.py's machinery
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

    def whole(graph, label):
        cfg = TrainConfig(batch_size=B, n_train_samples=fanouts,
                          n_val_samples=fanouts, output_dims=(128, 128),
                          compute_dtype="bfloat16")
        spe = len(problem.folds["train"]) // B
        model = build_model(cfg, problem.n_nodes, problem.n_classes)
        tr = Trainer(model, cfg, spe, task=problem.task)
        state = tr.init_state(graph)
        n = min(200, spe) * B
        fid = jnp.asarray(problem.folds["train"][:n], jnp.int32)
        ftg = jnp.asarray(store.targets[problem.folds["train"][:n]])
        state, m = tr.train_epoch(state, graph, fid, ftg)
        float(m["loss"])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, m = tr.train_epoch(state, graph, fid, ftg)
            float(m["loss"])
            times.append(time.perf_counter() - t0)
        steps = n // B
        dt = sorted(times)[1]
        edges = B * (fanouts[0] + fanouts[0] * fanouts[1])
        print(json.dumps({
            "step": label, "ms_per_step": round(1e3 * dt / steps, 3),
            "edges_per_sec": round(edges * steps / dt, 1),
        }), flush=True)

    whole(dense, "dense")
    whole(csr_elem, "csr_element")
    whole(csr, "csr_window")


if __name__ == "__main__":
    main()
