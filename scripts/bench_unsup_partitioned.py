"""Partitioned unsupervised NCE throughput (VERDICT #1 TPU row).

On one chip the mesh is 1-shard (collectives degenerate); the number is the
structural-overhead-inclusive throughput of the multi-chip program.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: F401

from tpu_sage.data.synthetic import bench_store
from tpu_sage.dist.mesh import make_mesh
from tpu_sage.dist.unsupervised import PartitionedUnsupervisedTrainer
from tpu_sage.train.trainer import TrainConfig
from tpu_sage.train.unsupervised import UnsupConfig


def main():
    store = bench_store()
    cfg = TrainConfig(aggregator_class="mean", batch_size=512,
                      n_train_samples=(25, 10), n_val_samples=(25, 10),
                      output_dims=(128, 128), epochs=1,
                      compute_dtype="bfloat16")
    unsup = UnsupConfig(walk_length=3, n_negatives=10)
    mesh = make_mesh()
    tr, graph, fold_ids, fold_w = PartitionedUnsupervisedTrainer.from_store(
        store, cfg, unsup, mesh
    )
    state = tr.init_state(feat_dim=store.feat_dim)
    nsteps = int(os.environ.get("NSTEPS", 20))
    t0 = time.time()
    state, m = tr.train_epoch(state, graph, fold_ids, fold_w, n_steps=nsteps)
    float(m["loss"])
    print(json.dumps({"compile_s": round(time.time() - t0, 1),
                      "n_shards": tr.n_shards}), flush=True)
    for _ in range(3):
        t0 = time.time()
        state, m = tr.train_epoch(state, graph, fold_ids, fold_w,
                                  n_steps=nsteps)
        float(m["loss"])
        dt = time.time() - t0
        roots = 512 * (2 + 10)
        print(json.dumps({
            "ms_per_step": round(1000 * dt / nsteps, 2),
            "loss": round(float(m["loss"]), 3),
            "sampled_edges_per_sec": round(roots * 275 / (dt / nsteps), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
