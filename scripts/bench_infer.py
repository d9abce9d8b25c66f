"""Full-graph layer-wise inference throughput on one chip (serving surface).

Times ``nn.full_graph.embed_all_nodes`` — exact logits for EVERY node of the
Reddit-shaped bench graph (232 965 nodes x 602 feats, max_degree 128) — the
production-scoring/export path (tpu_sage/export.py). Unlike the sampled
training step this is matmul-dominated ((n, max_deg, d) masked summaries +
dense layers), so it is the MXU-bound end of the framework.

Prints one JSON line: nodes/s (all nodes scored), full-graph pass latency,
and aggregated-edge rate (n·max_degree adjacency slots summarized per layer).

    python scripts/bench_infer.py            # bf16 features (serving default)
    BENCH_AGG=gcn python scripts/bench_infer.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.nn.full_graph import embed_all_nodes
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

    def env_int(name, default, minimum=1):
        raw = os.environ.get(name, str(default))
        try:
            v = int(raw)
        except ValueError:
            raise SystemExit(f"{name} must be an integer, got {raw!r}")
        if v < minimum:
            raise SystemExit(f"{name} must be >= {minimum}, got {v}")
        return v

    aggregator = os.environ.get("BENCH_AGG", "mean")
    chunk = env_int("BENCH_CHUNK", 4096)
    repeats = env_int("BENCH_REPEATS", 5)
    config = TrainConfig(
        aggregator_class=aggregator,
        batch_size=512,
        n_train_samples=(25, 10),
        n_val_samples=(25, 10),
        output_dims=(128, 128),
        epochs=1,
        compute_dtype="bfloat16",
    )
    store = bench_store()
    problem = NodeProblem(store)
    model = build_model(config, problem.n_nodes, problem.n_classes)
    trainer = Trainer(model, config, 1, task=problem.task)
    # full adjacency (train=False): serving scores with every edge visible
    graph = problem.device_graph(train=False, dtype=jnp.bfloat16)
    state = trainer.init_state(graph)

    t0 = time.perf_counter()
    logits = embed_all_nodes(model, state.params, graph, chunk=chunk,
                             with_head=True)
    float(jnp.sum(logits))  # host-forced sync (see bench.py note)
    compile_s = time.perf_counter() - t0

    per_repeat = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        logits = embed_all_nodes(model, state.params, graph, chunk=chunk,
                                 with_head=True)
        float(jnp.sum(logits))
        per_repeat.append(time.perf_counter() - t0)
    med = float(np.median(per_repeat))
    n = graph.n_nodes
    n_layers = len(model.layer_specs)
    print(json.dumps({
        "metric": f"full_graph_inference_{aggregator}_nodes_per_sec",
        "value": round(n / med, 1),
        "unit": "nodes/s",
        "pass_ms": round(1000 * med, 2),
        "adj_slots_per_sec": round(n_layers * n * graph.max_degree / med, 1),
        "compile_s": round(compile_s, 2),
        "repeats_ms": [round(1000 * x, 2) for x in per_repeat],
        "repeats": repeats,
        "chunk": chunk,
        "n_nodes": n,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
