"""Golden-file test (SURVEY.md §4.2 #5): the checked-in problem.h5 artifact
keeps loading with stable schema and values across framework versions."""

import os

import numpy as np

from tpu_sage.data.problem import NodeProblem

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_problem.h5")


def test_golden_loads_with_stable_schema():
    p = NodeProblem.from_h5(GOLDEN)
    assert p.n_nodes == 64 and p.feats_dim == 8 and p.n_classes == 3
    assert p.task == "classification"
    assert p.store.max_degree == 8
    # fold partition covers every node exactly once
    all_ids = np.concatenate([p.folds[f] for f in ("train", "val", "test")])
    assert sorted(all_ids.tolist()) == list(range(64))
    # adjacency invariants: ids in range, degrees consistent, self-id padding
    adj, deg = p.store.adj, p.store.degrees
    assert adj.min() >= 0 and adj.max() < 64
    for v in range(64):
        assert (adj[v, deg[v]:] == v).all()


def test_golden_trains_one_epoch():
    from tpu_sage.train.trainer import TrainConfig, fit

    p = NodeProblem.from_h5(GOLDEN)
    cfg = TrainConfig(batch_size=16, epochs=1, n_train_samples=(3, 2),
                      n_val_samples=(3, 2), output_dims=(8, 8))
    _, _, hist = fit(p, cfg, log=lambda d: None)
    assert np.isfinite(hist[0]["train_loss"])
