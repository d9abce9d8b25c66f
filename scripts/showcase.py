"""Quality + throughput showcase: the canonical Reddit-mean config at full
scale on an assortative synthetic graph (the graph carries the label signal).

    python scripts/showcase.py [--epochs 10] [--check-features-insufficient]

Prints the per-epoch JSON log and a final summary line. With
``--check-features-insufficient`` it also fits a feature-only logistic probe
to show the accuracy is coming from neighborhood aggregation, not features.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# (sys.path, not PYTHONPATH: the env var interferes with axon PJRT plugin
# discovery at interpreter start)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--nodes", type=int, default=232_965)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--check-features-insufficient", action="store_true")
    ap.add_argument("--feature-int8", action="store_true",
                    help="int8 feature table (quality check for the lossy "
                         "storage option)")
    args = ap.parse_args(argv)

    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import assortative_bench_store
    from tpu_sage.train.trainer import TrainConfig, fit

    store = assortative_bench_store(n_nodes=args.nodes)
    problem = NodeProblem(store)

    if args.check_features_insufficient:
        from sklearn.linear_model import LogisticRegression

        print(json.dumps({"status": "fitting feature-only control probe"}),
              flush=True)
        tr = problem.folds["train"][:8000]
        va = problem.folds["val"][:4000]
        probe = LogisticRegression(max_iter=80, tol=1e-2).fit(
            store.feats[tr], store.targets[tr]
        )
        acc = probe.score(store.feats[va], store.targets[va])
        print(json.dumps({"feature_only_probe_acc": round(float(acc), 4),
                          "chance": round(1.0 / store.n_classes, 4)}),
              flush=True)

    config = TrainConfig(
        aggregator_class="mean",
        n_train_samples=(25, 10),
        n_val_samples=(25, 10),
        output_dims=(128, 128),
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr_init=0.01,
        compute_dtype=args.compute_dtype,
        feature_int8=args.feature_int8,
    )
    t0 = time.time()
    _, _, hist = fit(problem, config)
    total = time.time() - t0
    f1, f2 = 25, 10
    spe = len(problem.folds["train"]) // args.batch_size
    steady = [h["elapsed"] for h in hist[1:]] or [hist[0]["elapsed"]]
    edges_s = spe * args.batch_size * (f1 + f1 * f2) / (sum(steady) / len(steady))
    print(json.dumps({
        "final_val_accuracy": hist[-1].get("val_metric"),
        "total_wallclock_s": round(total, 1),
        "steady_state_edges_per_sec": round(edges_s, 1),
        "epochs": args.epochs,
        "n_nodes": args.nodes,
        "feature_int8": args.feature_int8,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
