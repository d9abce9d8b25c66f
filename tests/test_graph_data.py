"""Padded-adjacency construction, degree inference, and h5 schema tests."""

import numpy as np
import pytest

from tpu_sage.data.convert import from_edgelist, save_problem_h5
from tpu_sage.data.problem import NodeProblem, infer_degrees
from tpu_sage.data.synthetic import sbm_store
from tpu_sage.graph.graph_data import build_padded_adjacency


def test_padded_adjacency_basic():
    edges = np.array([[0, 1], [0, 2], [1, 2]])
    adj, deg = build_padded_adjacency(edges, 4, max_degree=4)
    assert adj.shape == (4, 4) and adj.dtype == np.int32
    assert deg.tolist() == [2, 2, 2, 0]
    assert set(adj[0, :2].tolist()) == {1, 2}
    # padding is self id
    assert adj[0, 2] == 0 and adj[0, 3] == 0
    # isolated node row is all-self
    assert (adj[3] == 3).all()


def test_padded_adjacency_truncation():
    # node 0 has 10 neighbors, max_degree 4 -> random subsample of true nbrs
    edges = np.array([[0, i] for i in range(1, 11)])
    adj, deg = build_padded_adjacency(edges, 11, max_degree=4, symmetrize=False)
    assert deg[0] == 4
    assert set(adj[0].tolist()) <= set(range(1, 11))
    assert len(set(adj[0].tolist())) == 4  # without replacement


def test_padded_adjacency_dedup():
    edges = np.array([[0, 1], [0, 1], [0, 1]])
    adj, deg = build_padded_adjacency(edges, 2, max_degree=4, symmetrize=False)
    assert deg[0] == 1


def test_infer_degrees_roundtrip():
    rng = np.random.default_rng(0)
    edges = np.stack([rng.integers(0, 50, 200), rng.integers(0, 50, 200)], 1)
    edges = edges[edges[:, 0] != edges[:, 1]]
    adj, deg = build_padded_adjacency(edges, 50, max_degree=16)
    inferred = infer_degrees(adj)
    # inference can undercount only when a row's real last neighbor == self id
    # (impossible: self-edges are excluded), so it must match exactly
    np.testing.assert_array_equal(inferred, deg)


def test_h5_roundtrip_schema(tmp_path):
    store = sbm_store(n_nodes=200, n_classes=3, feat_dim=8, avg_degree=4, seed=1)
    path = str(tmp_path / "problem.h5")
    save_problem_h5(store, path)

    import h5py

    with h5py.File(path, "r") as f:
        # reference problem.h5 surface (SURVEY.md §2.1 "Problem container")
        for key in ("adj", "train_adj", "feats", "targets", "folds"):
            assert key in f, key
        assert f.attrs["task"] == "classification"
        assert f.attrs["n_classes"] == 3

    problem = NodeProblem.from_h5(path)
    assert problem.n_nodes == 200
    assert problem.feats_dim == 8
    np.testing.assert_array_equal(problem.store.adj, store.adj)
    np.testing.assert_array_equal(problem.store.degrees, store.degrees)
    for fold in ("train", "val", "test"):
        np.testing.assert_array_equal(problem.folds[fold], store.folds[fold])


def test_train_adj_is_inductive():
    """train_adj must contain no edges touching val/test nodes."""
    store = sbm_store(n_nodes=300, n_classes=3, feat_dim=8, avg_degree=5, seed=2)
    is_train = np.zeros(store.n_nodes, dtype=bool)
    is_train[store.folds["train"]] = True
    for v in range(store.n_nodes):
        deg = store.train_degrees[v]
        if not is_train[v]:
            assert deg == 0
        for u in store.train_adj[v, :deg]:
            assert is_train[u]


def test_iterate_protocol():
    store = sbm_store(n_nodes=200, n_classes=3, feat_dim=8, seed=3)
    problem = NodeProblem(store)
    seen = []
    last_progress = 0.0
    for ids, targets, progress in problem.iterate("train", batch_size=32, shuffle=True, seed=0):
        assert len(ids) == len(targets)
        assert progress > last_progress
        last_progress = progress
        seen.extend(ids.tolist())
    assert last_progress == pytest.approx(1.0)
    assert sorted(seen) == sorted(problem.folds["train"].tolist())
