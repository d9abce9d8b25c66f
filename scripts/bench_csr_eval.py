"""Cost of exact_val under CSR training storage (VERDICT r3 Weak #6 tail).

With ``--csr-adjacency --exact-val`` the FULL graph densifies for the eval
pass only (layer-wise inference walks whole adjacency rows; training stays
CSR). This measures, at the headline bench scale (232 965 nodes x 602
feats, max_degree 128), the three costs a user trades between:

  1. the one-time densify+upload of the eval adjacency (the CSR tax),
  2. the exact full-graph pass itself (identical for both storages), and
  3. a sampled eval epoch over the val fold (the alternative to exact_val).

Prints one JSON line per measurement. Run on the chip:

    python scripts/bench_csr_eval.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.nn.full_graph import embed_all_nodes
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

    store = bench_store()
    problem = NodeProblem(store)
    config = TrainConfig(
        batch_size=512, n_train_samples=(25, 10), n_val_samples=(25, 10),
        output_dims=(128, 128), compute_dtype="bfloat16",
    )
    model = build_model(config, problem.n_nodes, problem.n_classes)

    # 1. densify+upload: the eval adjacency a CSR-storage run builds once
    for name, csr in (("dense_eval_graph_build", False),
                      ("csr_eval_graph_build", True)):
        t0 = time.perf_counter()
        g = problem.device_graph(train=False, csr=csr)
        jax.block_until_ready(g.feats)
        dt = time.perf_counter() - t0
        print(json.dumps({"op": name, "seconds": round(dt, 3)}), flush=True)
        if not csr:
            graph_full = g
        del g

    # 2. the exact full-graph pass (dense eval graph — same either storage)
    steps_per_epoch = len(problem.folds["train"]) // config.batch_size
    trainer = Trainer(model, config, steps_per_epoch, task=problem.task)
    graph_train = problem.device_graph(train=True)
    state = trainer.init_state(graph_train)
    logits = embed_all_nodes(model, state.params, graph_full, with_head=True)
    float(jnp.sum(logits))  # compile + host-forced sync (bench.py note: on
    # axon, block_until_ready can report ready before chained dispatches
    # execute — r4d_csr_eval.log read a 0.0 s "pass" that way)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        logits = embed_all_nodes(model, state.params, graph_full,
                                 with_head=True)
        float(jnp.sum(logits))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    print(json.dumps({"op": "exact_full_graph_pass",
                      "seconds": round(dt, 3),
                      "nodes_per_sec": round(store.n_nodes / dt, 1)}),
          flush=True)

    # 3. sampled eval of the val fold for contrast
    val_ids = problem.folds["val"]
    tgt = problem.store.targets[val_ids]
    key = jax.random.key(7)
    m = trainer.evaluate(state.params, graph_full, val_ids, tgt, key)  # compile
    float(m["metric"]) if isinstance(m, dict) else float(jnp.asarray(m))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        m = trainer.evaluate(state.params, graph_full, val_ids, tgt, key)
        float(m["metric"]) if isinstance(m, dict) else float(jnp.asarray(m))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    print(json.dumps({"op": "sampled_val_fold_eval", "seconds": round(dt, 3),
                      "n_val": int(len(val_ids))}), flush=True)


if __name__ == "__main__":
    main()
