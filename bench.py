"""Headline benchmark: Reddit-shaped GraphSAGE-mean edges/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

``vs_baseline`` is measured edges/s divided by the PyTorch baseline recorded
in BASELINE_MEASURED.json (the reference publishes no numbers and the mount
is empty — BASELINE.md; the baseline is the reference-semantics torch impl in
tpu_sage/bench/torch_baseline.py measured on this machine). The [B] target is
vs_baseline ≥ 2.0 at matching model semantics.

Method: device-resident Reddit-shaped graph (232 965 nodes × 602 feats,
max_degree 128), batch 512, fanout (25, 10), 2-layer mean aggregator, hidden
128 — the reference's canonical Reddit config (SURVEY.md §2.4 #7). The timed
unit is the jit'd whole-epoch ``lax.scan`` (zero host traffic per step);
edges/s = steps · B·(f₁ + f₁·f₂) / elapsed, with ``block_until_ready`` fences.

Default feature storage is the dense bf16 table (BENCH_INT8=1 for int8 with
per-column scales). int8 was the default in rounds 2b-2i, when halving the
gather bytes was worth ~15%; the round-2f fused deepest-level gather+mean
ships means instead of raw rows, and with it the EXACT bf16 table measures
faster than int8 (57.35M vs 56.59M edges/s back-to-back, round 2j,
bench_logs/) — so the headline returned to exactness-mode storage. int8
stays for the partitioned halo exchange (4× fewer ICI bytes) and HBM-tight
configs; quality was verified identical at Reddit scale either way
(RESULTS.md). The ``feature_storage`` field labels the config.

Round 3: the gather form flipped to plain+chunked everywhere (61.46M plain
vs 59.70M masked at 8 chunks, same session — the chunk overlap beats round
2d's defusion trick) and the chunk-count sweep settled on 10 (divisors of
the deepest level's 12 800 roots win; RESULTS.md round 3). Current headline
at defaults: **62.18M edges/s/chip, 76.7× the torch baseline,
2.265 ms/step** (bf16; int8 58.81M).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp


    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

    # 512 is the reference's canonical Reddit batch and measures most stably
    # on this backend (the axon tunnel's per-session state adds variance at
    # larger batches: 1024 measured 60.6M edges/s in one session and ~31M in
    # another — STATUS.md). Quality matches at either size (RESULTS.md).
    batch_size = int(os.environ.get("BENCH_BATCH", 512))
    fanouts = (25, 10)
    store = bench_store()
    problem = NodeProblem(store)

    compute_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    aggregator = os.environ.get("BENCH_AGG", "mean")
    config = TrainConfig(
        aggregator_class=aggregator,
        batch_size=batch_size,
        n_train_samples=fanouts,
        n_val_samples=fanouts,
        output_dims=(128, 128),
        agg_hidden_dim=int(os.environ.get("BENCH_HIDDEN", 512)),
        epochs=3,
        lr_init=0.01,
        compute_dtype=compute_dtype,
        fuse_first_layer=os.environ.get("BENCH_FUSE", "0") == "1",
    )
    train_ids = problem.folds["train"]
    steps_per_epoch = len(train_ids) // batch_size
    model = build_model(config, problem.n_nodes, problem.n_classes)
    trainer = Trainer(model, config, steps_per_epoch, task=problem.task)
    graph = problem.device_graph(
        train=True,
        dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32,
        csr=os.environ.get("BENCH_CSR", "0") == "1",
        quantize=os.environ.get("BENCH_INT8", "0") == "1",
    )
    state = trainer.init_state(graph)

    n = steps_per_epoch * batch_size
    fold_ids = jnp.asarray(train_ids[:n], jnp.int32)
    fold_targets = jnp.asarray(store.targets[train_ids[:n]])

    # warmup (compile + first epoch). NOTE: forcing is a host transfer
    # (float()), not block_until_ready — on the axon backend chained
    # dispatches that are never host-forced can report ready early, which
    # once produced a nonsense 81e9 edges/s reading. float() is sync-exact.
    state, m = trainer.train_epoch(state, graph, fold_ids, fold_targets)
    float(m["loss"])

    # Median-of-k with spread: the axon tunnel adds large run-to-run variance
    # at some batch sizes (60.6M vs ~31M observed for identical programs —
    # STATUS.md), so a single timing is not trustworthy. Each repeat times one
    # full scanned epoch, hard-synced; the headline is the MEDIAN.
    repeats = int(os.environ.get("BENCH_REPEATS", 5))
    f1, f2 = fanouts
    edges_per_step = batch_size * (f1 + f1 * f2)
    per_repeat = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, m = trainer.train_epoch(state, graph, fold_ids, fold_targets)
        float(m["loss"])  # hard sync per epoch; ~µs vs the 2.5 s epoch
        dt = time.perf_counter() - t0
        per_repeat.append(steps_per_epoch * edges_per_step / dt)

    med = float(np.median(per_repeat))
    q1, q3 = np.percentile(per_repeat, [25, 75])

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            vs = med / json.load(f)["torch_edges_per_sec"]

    print(json.dumps({
        "metric": f"reddit_shaped_graphsage_{aggregator}_edges_per_sec_per_chip",
        "value": round(med, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "repeats": [round(x, 1) for x in per_repeat],
        "iqr": [round(float(q1), 1), round(float(q3), 1)],
        "ms_per_step": round(1000.0 * edges_per_step / med, 3),
        "feature_storage": (
            "int8" if os.environ.get("BENCH_INT8", "0") == "1" else compute_dtype
        ),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
