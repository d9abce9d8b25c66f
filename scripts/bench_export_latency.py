"""End-to-end serving-export latency at Reddit scale (VERDICT r4 weak #6).

Times the WHOLE `tpu_sage.export` path a serving stack pays: problem load
(cached bench store), checkpoint load, exact full-graph layer-wise
inference, and the `.npy` write — separately and end-to-end. Uses a
freshly-initialized checkpoint (weights don't change the cost shape).

    python scripts/bench_export_latency.py [--logits]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logits", action="store_true")
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--out-dtype", default="float32",
                    choices=["float32", "float16"])
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.nn.full_graph import embed_all_nodes
    from tpu_sage.train.checkpoint import load_checkpoint, save_checkpoint
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

    t0 = time.perf_counter()
    store = bench_store()
    problem = NodeProblem(store)
    t_store = time.perf_counter() - t0

    config = TrainConfig(batch_size=512, n_train_samples=(25, 10),
                         n_val_samples=(25, 10), output_dims=(128, 128),
                         compute_dtype="bfloat16")
    model = build_model(config, problem.n_nodes, problem.n_classes)
    trainer = Trainer(model, config, 1, task=problem.task)

    t0 = time.perf_counter()
    graph = problem.device_graph(train=False, dtype=jnp.bfloat16)
    state = trainer.init_state(graph)
    t_upload = time.perf_counter() - t0

    ckpt = "/tmp/r5_export_ckpt.npz"
    save_checkpoint(ckpt, state, config=config)
    t0 = time.perf_counter()
    state = load_checkpoint(ckpt, state)
    t_ckpt = time.perf_counter() - t0

    # compile + warm pass (serving processes pay this once)
    out = embed_all_nodes(model, state.params, graph, chunk=args.chunk,
                          with_head=args.logits)
    out.block_until_ready()

    t0 = time.perf_counter()
    out = embed_all_nodes(model, state.params, graph, chunk=args.chunk,
                          with_head=args.logits)
    out.block_until_ready()
    t_infer = time.perf_counter() - t0

    t0 = time.perf_counter()
    if args.out_dtype != "float32":
        out = out.astype(args.out_dtype)  # on device — halves the fetch bytes
        out.block_until_ready()
    arr = np.asarray(out)
    np.save("/tmp/r5_export_out.npy", arr)
    t_write = time.perf_counter() - t0

    n = problem.n_nodes
    print(json.dumps({
        "kind": "logits" if args.logits else "embeddings",
        "shape": list(arr.shape), "n_nodes": n,
        "store_load_s": round(t_store, 2),
        "graph_upload_s": round(t_upload, 2),
        "checkpoint_load_s": round(t_ckpt, 2),
        "exact_pass_s": round(t_infer, 3),
        "fetch_and_npy_write_s": round(t_write, 2),
        "end_to_end_warm_s": round(t_infer + t_write, 2),
        "nodes_per_s_warm": round(n / (t_infer + t_write)),
    }), flush=True)


if __name__ == "__main__":
    main()
