"""Weak-scaling harness for the partitioned trainer (SURVEY.md §6 target:
≥80% edges/s efficiency 1 → N hosts).

Runs the node-sharded training step over meshes of growing size with the
per-shard batch held constant (weak scaling) and reports edges/s and
efficiency vs the 1-shard run. On real multi-chip hardware this measures ICI
halo-exchange overhead; on the CPU test backend (8 virtual devices) it
validates the harness and the sharding — CPU numbers are NOT performance
claims (every "device" shares the same socket).

    python -m tpu_sage.bench.scaling --devices 1,2,4,8
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure(n_devices: int, n_nodes: int, batch_per_shard: int, steps: int,
            fanouts=(25, 10), feat_dim=602, seed=0) -> dict:
    import jax
    import jax.numpy as jnp

    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.dist.mesh import make_mesh
    from tpu_sage.dist.train import PartitionedTrainer
    from tpu_sage.train.trainer import TrainConfig

    mesh = make_mesh(n_devices=n_devices)
    store = bench_store(n_nodes=n_nodes, feat_dim=feat_dim, seed=seed)
    config = TrainConfig(
        batch_size=batch_per_shard * n_devices,
        n_train_samples=tuple(fanouts),
        n_val_samples=tuple(fanouts),
        output_dims=(128, 128),
    )
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(store, config, mesh)
    state = trainer.init_state(feat_dim=store.feat_dim)

    state, m = trainer.train_step(state, graph, fold_ids, fold_w)
    float(m["loss"])  # compile + hard sync
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = trainer.train_step(state, graph, fold_ids, fold_w)
    float(m["loss"])
    dt = time.perf_counter() - t0

    f1, f2 = fanouts
    edges = steps * config.batch_size * (f1 + f1 * f2)
    return {
        "n_devices": n_devices,
        "edges_per_sec": edges / dt,
        "ms_per_step": dt / steps * 1e3,
        "batch_size": config.batch_size,
    }


def main(argv=None):  # pragma: no cover
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--nodes", type=int, default=65536)
    ap.add_argument("--batch-per-shard", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args(argv)

    results = []
    base = None
    for n in (int(x) for x in args.devices.split(",")):
        r = measure(n, args.nodes, args.batch_per_shard, args.steps)
        if base is None:
            base = r["edges_per_sec"] / r["n_devices"]
        r["efficiency"] = r["edges_per_sec"] / (base * r["n_devices"])
        results.append(r)
        print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":  # pragma: no cover
    main()
