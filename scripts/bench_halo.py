"""Halo-exchange cost measurement (VERDICT round-1 #5: replace the "XLA can
overlap" assertion with numbers).

Two measurements, selected by the backend it runs on:

- CPU (8 virtual devices, run with JAX_PLATFORMS=cpu
  XLA_FLAGS=--xla_force_host_platform_device_count=8): RELATIVE per-step cost
  of the three halo implementations (exact / ring / bucketed) on the 8-shard
  partitioned trainer. Correctness-grade comparison — all "devices" share one
  socket, so only the ratio between modes is meaningful.

- TPU (default env, 1 chip): partitioned-path (1-shard, collectives
  degenerate) vs the replicated single-device trainer at MATCHED shapes —
  the structural overhead the partitioned formulation carries before any
  real ICI traffic exists.

Prints JSONL; the round driver stores the combined output as
SCALING_r{N}.json next to bench results.
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


def time_partitioned(halo, n_nodes, feat_dim, batch_size, steps, fanouts,
                     feature_int8=False):
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.dist.mesh import make_mesh
    from tpu_sage.dist.train import PartitionedTrainer
    from tpu_sage.train.trainer import TrainConfig

    mesh = make_mesh()
    store = bench_store(n_nodes=n_nodes, feat_dim=feat_dim, seed=0)
    config = TrainConfig(
        batch_size=batch_size, n_train_samples=fanouts, n_val_samples=fanouts,
        output_dims=(128, 128), halo=halo, compute_dtype="bfloat16",
        feature_int8=feature_int8,
        # experimental chunked halo exchange (TrainConfig.halo_chunks)
        halo_chunks=int(os.environ.get("BENCH_HALO_CHUNKS", "1")),
    )
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
        store, config, mesh
    )
    state = trainer.init_state(feat_dim=store.feat_dim)
    state, m = trainer.train_epoch(state, graph, fold_ids, fold_w, n_steps=steps)
    float(m["loss"])  # compile + sync
    t0 = time.perf_counter()
    state, m = trainer.train_epoch(state, graph, fold_ids, fold_w, n_steps=steps)
    float(m["loss"])
    dt = time.perf_counter() - t0
    return 1e3 * dt / steps, mesh.devices.size


def time_replicated(n_nodes, feat_dim, batch_size, steps, fanouts):
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

    store = bench_store(n_nodes=n_nodes, feat_dim=feat_dim, seed=0)
    problem = NodeProblem(store)
    config = TrainConfig(
        batch_size=batch_size, n_train_samples=fanouts, n_val_samples=fanouts,
        output_dims=(128, 128), compute_dtype="bfloat16",
    )
    train_ids = problem.folds["train"]
    spe = max(1, len(train_ids) // batch_size)
    model = build_model(config, problem.n_nodes, problem.n_classes)
    trainer = Trainer(model, config, spe, task=problem.task)
    graph = problem.device_graph(train=True, dtype=jnp.bfloat16)
    state = trainer.init_state(graph)
    n = min(steps, spe) * batch_size
    fold_ids = jnp.asarray(train_ids[:n], jnp.int32)
    fold_tgt = jnp.asarray(store.targets[train_ids[:n]])
    state, m = trainer.train_epoch(state, graph, fold_ids, fold_tgt)
    float(m["loss"])
    t0 = time.perf_counter()
    state, m = trainer.train_epoch(state, graph, fold_ids, fold_tgt)
    float(m["loss"])
    dt = time.perf_counter() - t0
    return 1e3 * dt / (n // batch_size)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nodes", type=int, default=65536)
    ap.add_argument("--feat-dim", type=int, default=602)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args(argv)
    fanouts = (25, 10)

    platform = jax.devices()[0].platform
    n_dev = len(jax.devices())
    print(json.dumps({"platform": platform, "n_devices": n_dev}), flush=True)

    if platform == "cpu" and n_dev >= 8:
        for halo, int8 in (("exact", False), ("ring", False),
                           ("pipelined", False), ("bucketed", False),
                           ("exact", True), ("pipelined", True)):
            times = [
                time_partitioned(halo, args.nodes, args.feat_dim,
                                 args.batch_size, args.steps, fanouts,
                                 feature_int8=int8)[0]
                for _ in range(args.repeats)
            ]
            print(json.dumps({
                "mode": f"partitioned_{halo}_8shard" + ("_int8" if int8 else ""),
                "ms_per_step_median": round(sorted(times)[len(times) // 2], 3),
                "ms_per_step_all": [round(t, 3) for t in times],
            }), flush=True)
    else:
        for halo, int8 in (("exact", False), ("ring", False),
                           ("exact", True)):
            times = [
                time_partitioned(halo, args.nodes, args.feat_dim,
                                 args.batch_size, args.steps, fanouts,
                                 feature_int8=int8)[0]
                for _ in range(args.repeats)
            ]
            print(json.dumps({
                "mode": f"partitioned_{halo}_1chip" + ("_int8" if int8 else ""),
                "ms_per_step_median": round(sorted(times)[len(times) // 2], 3),
                "ms_per_step_all": [round(t, 3) for t in times],
            }), flush=True)
        times = [
            time_replicated(args.nodes, args.feat_dim, args.batch_size,
                            args.steps, fanouts)
            for _ in range(args.repeats)
        ]
        print(json.dumps({
            "mode": "replicated_1chip",
            "ms_per_step_median": round(sorted(times)[len(times) // 2], 3),
            "ms_per_step_all": [round(t, 3) for t in times],
        }), flush=True)


if __name__ == "__main__":
    main()
