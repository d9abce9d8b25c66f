"""Synthetic graph generators for tests and benchmarks.

No network access in this environment (SURVEY.md §7.0), so real datasets are
stand-ins generated locally:

- ``sbm_problem``: a stochastic-block-model graph with class-correlated
  features — genuinely learnable, used for convergence tests ("Cora-like").
- ``bench_store``: a Reddit-scale random neighbor table with class-clustered
  features — shape-realistic for throughput benchmarks (n≈232k, d=602, 41
  classes, max_degree 128 mirror the real Reddit artifact the reference
  trains on).

If the driver later provides real dataset files, ``tpu_sage.data.convert``
ingests them; these generators keep the test/bench suite self-contained.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from tpu_sage.data.problem import FOLD_CODES, NodeProblem
from tpu_sage.graph.graph_data import GraphStore, build_padded_adjacency


def _split_folds(
    n: int, rng: np.random.Generator, val_frac: float = 0.2, test_frac: float = 0.2
) -> Dict[str, np.ndarray]:
    perm = rng.permutation(n)
    n_val = int(n * val_frac)
    n_test = int(n * test_frac)
    return {
        "val": np.sort(perm[:n_val]).astype(np.int64),
        "test": np.sort(perm[n_val : n_val + n_test]).astype(np.int64),
        "train": np.sort(perm[n_val + n_test :]).astype(np.int64),
    }


def fold_codes_from_folds(n: int, folds: Dict[str, np.ndarray]) -> np.ndarray:
    codes = np.zeros(n, dtype=np.int8)
    for name, code in FOLD_CODES.items():
        codes[folds[name]] = code
    return codes


def sbm_store(
    n_nodes: int = 2708,
    n_classes: int = 7,
    feat_dim: int = 64,
    avg_degree: int = 8,
    p_in: float = 0.9,
    feat_noise: float = 1.0,
    max_degree: int = 32,
    task: str = "classification",
    seed: int = 0,
    centroid_seed: Optional[int] = None,
) -> GraphStore:
    """Stochastic-block-model GraphStore with class-signal features.

    Each node draws ``avg_degree`` endpoints; with prob ``p_in`` the endpoint
    is same-class, else uniform. Features are the class centroid (a random
    unit vector scaled) plus N(0, feat_noise). The train adjacency keeps only
    edges whose BOTH endpoints are train-fold nodes (the reference's
    inductive ``train_adj`` semantics, SURVEY.md §2.1).

    ``centroid_seed``: draw the class→feature mapping (centroids, and the
    regression weight) from its OWN rng so two stores with different
    structural ``seed``/size share one generative process — the cross-graph
    inductive-inference setup (the paper's headline claim, SURVEY.md §0.1):
    train on store A, embed/classify a disjoint store B. None keeps the
    single-seed draw (bit-identical to the historical generator).
    """
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, size=n_nodes)
    by_class = [np.nonzero(labels == c)[0] for c in range(n_classes)]

    src = np.repeat(np.arange(n_nodes), avg_degree)
    same = rng.random(len(src)) < p_in
    dst = rng.integers(0, n_nodes, size=len(src))
    for c in range(n_classes):
        mask = same & (labels[src] == c)
        if mask.any() and len(by_class[c]):
            dst[mask] = rng.choice(by_class[c], size=mask.sum())
    keep = src != dst
    edges = np.stack([src[keep], dst[keep]], axis=1)

    folds = _split_folds(n_nodes, rng)
    adj, degrees = build_padded_adjacency(edges, n_nodes, max_degree, rng)
    is_train = np.zeros(n_nodes, dtype=bool)
    is_train[folds["train"]] = True
    train_edges = edges[is_train[edges[:, 0]] & is_train[edges[:, 1]]]
    train_adj, train_degrees = build_padded_adjacency(train_edges, n_nodes, max_degree, rng)

    crng = rng if centroid_seed is None else np.random.default_rng(centroid_seed)
    centroids = crng.normal(size=(n_classes, feat_dim)).astype(np.float32)
    centroids *= 3.0 / np.linalg.norm(centroids, axis=1, keepdims=True)
    feats = centroids[labels] + rng.normal(
        scale=feat_noise, size=(n_nodes, feat_dim)
    ).astype(np.float32)

    if task == "classification":
        targets = labels.astype(np.int64)
    elif task == "multilabel_classification":
        # correlated multilabel: own class always on, a few extra random bits
        targets = np.zeros((n_nodes, n_classes), dtype=np.float32)
        targets[np.arange(n_nodes), labels] = 1.0
        extra = rng.random((n_nodes, n_classes)) < 0.1
        targets = np.maximum(targets, extra.astype(np.float32))
    elif task in ("regression", "regression_mae"):
        w = crng.normal(size=(feat_dim, 1)).astype(np.float32)
        targets = (feats @ w + rng.normal(scale=0.1, size=(n_nodes, 1))).astype(np.float32)
        n_classes = 1  # regression head width = target columns, not classes
    else:
        raise ValueError(f"unknown task: {task}")

    return GraphStore(
        adj=adj,
        degrees=degrees,
        train_adj=train_adj,
        train_degrees=train_degrees,
        feats=feats.astype(np.float32),
        targets=targets,
        folds=folds,
        task=task,
        n_classes=n_classes,
    )


def sbm_problem(**kwargs) -> NodeProblem:
    return NodeProblem(sbm_store(**kwargs))


def assortative_bench_store(
    n_nodes: int = 232_965,
    feat_dim: int = 602,
    n_classes: int = 41,
    max_degree: int = 128,
    p_in: float = 0.7,
    feat_signal: float = 0.05,  # calibrated: feature-only probe ≈12% (41 cls),
    feat_noise: float = 1.0,    # while 25-neighbor aggregation separates fully
    seed: int = 0,
) -> GraphStore:
    """Reddit-scale graph where the GRAPH carries the label signal.

    Each adjacency slot is same-class with probability ``p_in`` (else uniform
    random), and features carry only a weak class signal — so reaching good
    accuracy requires actual neighborhood aggregation, not a linear probe of
    the features. The quality showcase for the canonical Reddit-mean config
    (scripts/showcase.py).
    """
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, size=n_nodes)
    order = np.argsort(labels, kind="stable")
    sorted_labels = labels[order]
    class_start = np.searchsorted(sorted_labels, np.arange(n_classes))
    class_size = np.bincount(labels, minlength=n_classes)

    same = rng.random((n_nodes, max_degree)) < p_in
    start = class_start[labels][:, None]
    size = np.maximum(class_size[labels][:, None], 1)
    within = (rng.random((n_nodes, max_degree)) * size).astype(np.int64)
    same_ids = order[start + np.minimum(within, size - 1)]
    other_ids = rng.integers(0, n_nodes, size=(n_nodes, max_degree))
    adj = np.where(same, same_ids, other_ids).astype(np.int32)
    degrees = np.full(n_nodes, max_degree, dtype=np.int32)

    centroids = rng.normal(size=(n_classes, feat_dim)).astype(np.float32)
    feats = (
        feat_signal * centroids[labels]
        + rng.normal(scale=feat_noise, size=(n_nodes, feat_dim))
    ).astype(np.float32)
    folds = _split_folds(n_nodes, rng, val_frac=0.1, test_frac=0.1)
    return GraphStore(
        adj=adj,
        degrees=degrees,
        train_adj=adj,
        train_degrees=degrees,
        feats=feats,
        targets=labels.astype(np.int64),
        folds=folds,
        task="classification",
        n_classes=n_classes,
    )


def bench_store(
    n_nodes: int = 232_965,
    feat_dim: int = 602,
    n_classes: int = 41,
    max_degree: int = 128,
    seed: int = 0,
    cache_dir: Optional[str] = None,
) -> GraphStore:
    """Reddit-shaped random graph for throughput benchmarks.

    Neighbor table is uniform-random ids at full degree (the real Reddit graph
    after max_degree-128 truncation is ~all-full rows); features are
    class-clustered so training has signal. Built directly as a padded table —
    no edge list materialization at 232k × 128 scale.

    Generation is deterministic in the arguments but costs minutes of host RNG
    at Reddit scale, so the arrays are cached on disk (``cache_dir``, default
    ``$TPU_SAGE_BENCH_CACHE`` or ``/tmp/tpu_sage_bench_cache``; set the env to
    ``0`` to disable) — back-to-back A/B bench runs then pay seconds, not
    minutes, and draw bit-identical graphs either way.
    """
    import os

    cache_dir = cache_dir or os.environ.get(
        "TPU_SAGE_BENCH_CACHE", "/tmp/tpu_sage_bench_cache"
    )
    cache_path = None
    if cache_dir and cache_dir != "0":
        cache_path = os.path.join(
            cache_dir,
            f"bench_store_{n_nodes}_{feat_dim}_{n_classes}_{max_degree}_{seed}.npz",
        )
        if os.path.exists(cache_path):
            with np.load(cache_path) as z:
                folds = {k: z[f"fold_{k}"] for k in ("train", "val", "test")}
                return GraphStore(
                    adj=z["adj"],
                    degrees=z["degrees"],
                    train_adj=z["adj"],
                    train_degrees=z["degrees"],
                    feats=z["feats"],
                    targets=z["targets"],
                    folds=folds,
                    task="classification",
                    n_classes=n_classes,
                )

    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, size=n_nodes)
    adj = rng.integers(0, n_nodes, size=(n_nodes, max_degree), dtype=np.int64).astype(
        np.int32
    )
    degrees = np.full(n_nodes, max_degree, dtype=np.int32)
    centroids = rng.normal(size=(n_classes, feat_dim)).astype(np.float32)
    feats = (centroids[labels] + rng.normal(size=(n_nodes, feat_dim))).astype(np.float32)
    folds = _split_folds(n_nodes, rng, val_frac=0.1, test_frac=0.1)
    targets = labels.astype(np.int64)
    if cache_path is not None:
        os.makedirs(cache_dir, exist_ok=True)
        # atomic publish so a concurrent bench never reads a half-written file
        tmp_path = cache_path + ".tmp.npz"
        with open(tmp_path, "wb") as f:
            np.savez(
                f,
                adj=adj,
                degrees=degrees,
                feats=feats,
                targets=targets,
                **{f"fold_{k}": v for k, v in folds.items()},
            )
        os.replace(tmp_path, cache_path)
    return GraphStore(
        adj=adj,
        degrees=degrees,
        train_adj=adj,
        train_degrees=degrees,
        feats=feats,
        targets=targets,
        folds=folds,
        task="classification",
        n_classes=n_classes,
    )
