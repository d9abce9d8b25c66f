"""Profiling / tracing harness (SURVEY.md §5.1 — reference has none).

Wraps ``jax.profiler`` so any training config can be traced to a
TensorBoard/Perfetto directory, plus a step-time breakdown helper.

    python -m tpu_sage.bench.profile --trace-dir /tmp/trace --steps 20
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def edges_per_batch(batch_size: int, fanouts) -> int:
    """Sampled edges aggregated per step: ``B·(f₁ + f₁·f₂ + …)`` —
    the bench-harness definition from SURVEY.md §6, any tree depth."""
    total, level = 0, batch_size
    for f in fanouts:
        level *= int(f)
        total += level
    return total


def profile_steps(trace_dir: str, steps: int = 20, batch_size: int = 512,
                  compute_dtype: str = "float32", trace: bool = False,
                  n_nodes: int = None, feat_dim: int = 602,
                  fanouts=(25, 10)) -> dict:
    """``trace=False`` (default): timing only. Perfetto tracing hangs on the
    axon backend (observed: start/stop_trace never returns through the
    tunnel); pass ``--trace`` only on standard PJRT backends — verified
    working on the CPU backend, where it writes the Perfetto
    ``*.trace.json.gz`` + ``*.xplane.pb`` pair (tests/test_profile.py)."""
    import jax
    import jax.numpy as jnp

    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

    store = (bench_store() if n_nodes is None
             else bench_store(n_nodes=n_nodes, feat_dim=feat_dim))
    problem = NodeProblem(store)
    fanouts = tuple(int(f) for f in fanouts)
    config = TrainConfig(batch_size=batch_size, n_train_samples=fanouts,
                         n_val_samples=fanouts, output_dims=(128, 128),
                         compute_dtype=compute_dtype)
    train_ids = problem.folds["train"]
    spe = len(train_ids) // batch_size
    model = build_model(config, problem.n_nodes, problem.n_classes)
    trainer = Trainer(model, config, spe, task=problem.task)
    graph = problem.device_graph(train=True)
    state = trainer.init_state(graph)
    ids = jnp.asarray(train_ids[:batch_size], jnp.int32)
    tgt = jnp.asarray(store.targets[train_ids[:batch_size]])

    # compile outside the trace
    state, m = trainer.train_step(state, graph, ids, tgt)
    float(m["loss"])

    if trace:
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = trainer.train_step(state, graph, ids, tgt)
    float(m["loss"])  # hard sync (axon: block_until_ready unreliable)
    dt = time.perf_counter() - t0
    if trace:
        jax.profiler.stop_trace()

    ms = dt / steps * 1e3
    return {"ms_per_step": round(ms, 3),
            "trace_dir": trace_dir if trace else None,
            "edges_per_sec": round(
                edges_per_batch(batch_size, fanouts) / (dt / steps), 1
            )}


def main(argv=None):  # pragma: no cover
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace-dir", default="/tmp/tpu_sage_trace")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--compute-dtype", default="float32")
    ap.add_argument("--trace", action="store_true",
                    help="collect a Perfetto trace (hangs on axon; see docstring)")
    ap.add_argument("--fanouts", default="25,10",
                    help="comma-separated per-layer fanouts (edges/s uses these)")
    args = ap.parse_args(argv)
    fanouts = tuple(int(f) for f in args.fanouts.split(","))
    print(json.dumps(profile_steps(args.trace_dir, args.steps, args.batch_size,
                                   args.compute_dtype, trace=args.trace,
                                   fanouts=fanouts)))


if __name__ == "__main__":  # pragma: no cover
    main()
