"""Drop-in dataset ingesters (VERDICT round-1 #7): Planetoid raw pickles and
OGB layouts, exercised on tiny fixtures written in the exact external
formats — if real Cora/OGBN data ever lands on disk, these loaders are the
proof they ingest without code changes."""

import gzip
import os
import pickle

import numpy as np
import pytest
from scipy import sparse as sp

from tpu_sage.data.convert import from_ogb, from_ogb_npz, from_planetoid


def _write_planetoid(path, name="toy", n_train=6, n_unlabeled=4, n_val=5,
                     n_test=5, n_feat=8, n_classes=3, seed=0):
    """Write a miniature but format-exact ind.{name}.* fixture set."""
    rng = np.random.default_rng(seed)
    n_allx = n_train + n_unlabeled + n_val
    n = n_allx + n_test

    def onehot(k):
        y = np.zeros((k, n_classes), dtype=np.int32)
        y[np.arange(k), rng.integers(0, n_classes, k)] = 1
        return y

    allx = sp.csr_matrix(rng.random((n_allx, n_feat)).astype(np.float32))
    tx = sp.csr_matrix(rng.random((n_test, n_feat)).astype(np.float32))
    x = allx[:n_train]
    ally, ty = onehot(n_allx), onehot(n_test)
    y = ally[:n_train]
    # shuffled test indices (the format's signature quirk)
    test_idx = n_allx + rng.permutation(n_test)
    graph = {
        i: [int(j) for j in rng.choice(n, 3, replace=False) if j != i]
        for i in range(n)
    }
    for suffix, obj in (("x", x), ("tx", tx), ("allx", allx), ("y", y),
                        ("ty", ty), ("ally", ally), ("graph", graph)):
        with open(os.path.join(path, f"ind.{name}.{suffix}"), "wb") as f:
            pickle.dump(obj, f)
    with open(os.path.join(path, f"ind.{name}.test.index"), "w") as f:
        f.write("\n".join(str(i) for i in test_idx) + "\n")
    return n, n_feat, n_classes, test_idx, np.asarray(tx.toarray())


def test_planetoid_ingests_and_reorders(tmp_path):
    n, n_feat, n_classes, test_idx, tx_rows = _write_planetoid(str(tmp_path))
    store = from_planetoid(str(tmp_path), "toy", max_degree=8)
    assert store.n_nodes == n and store.feat_dim == n_feat
    assert store.n_classes == n_classes and store.task == "classification"
    assert len(store.folds["train"]) == 6
    # clipped 500-window: everything after the train block up to the test
    # range (n_unlabeled + n_val = 9 in this toy set)
    assert len(store.folds["val"]) == 9
    np.testing.assert_array_equal(np.sort(store.folds["test"]),
                                  np.sort(test_idx))
    # the signature reorder: feats at the SHUFFLED test positions must equal
    # tx rows in tx order
    np.testing.assert_allclose(store.feats[test_idx], tx_rows, rtol=1e-6)
    # inductive split: train_adj drops edges touching val/test nodes
    assert store.train_degrees.sum() <= store.degrees.sum()


def test_planetoid_citeseer_isolated_nodes(tmp_path):
    """Citeseer quirk: test.index has holes (isolated test nodes missing from
    tx), so the index span exceeds tx's row count — the loader must
    zero-patch the span, not crash."""
    rng = np.random.default_rng(9)
    n_allx, n_tx, n_feat, n_classes = 10, 4, 6, 3
    span = n_tx + 2  # two isolated test nodes absent from tx
    n = n_allx + span

    allx = sp.csr_matrix(rng.random((n_allx, n_feat)).astype(np.float32))
    tx = sp.csr_matrix(rng.random((n_tx, n_feat)).astype(np.float32))

    def onehot(k):
        y = np.zeros((k, n_classes), dtype=np.int32)
        y[np.arange(k), rng.integers(0, n_classes, k)] = 1
        return y

    ally, ty = onehot(n_allx), onehot(n_tx)
    # present test indices: span [n_allx, n_allx+span) minus two holes
    present = np.array([n_allx, n_allx + 2, n_allx + 3, n_allx + span - 1])
    graph = {i: [int((i + 1) % n)] for i in range(n)}
    for suffix, obj in (("x", allx[:4]), ("tx", tx), ("allx", allx),
                        ("y", ally[:4]), ("ty", ty), ("ally", ally),
                        ("graph", graph)):
        with open(os.path.join(str(tmp_path), f"ind.cs.{suffix}"), "wb") as f:
            pickle.dump(obj, f)
    with open(os.path.join(str(tmp_path), "ind.cs.test.index"), "w") as f:
        f.write("\n".join(str(i) for i in rng.permutation(present)) + "\n")

    store = from_planetoid(str(tmp_path), "cs", max_degree=8)
    assert store.n_nodes == n
    assert np.isfinite(store.feats).all()
    # the hole nodes (n_allx+1, n_allx+4) are zero-patched
    assert (store.feats[n_allx + 1] == 0).all()
    np.testing.assert_array_equal(np.sort(store.folds["test"]), present)


def test_ogb_npz_roundtrip_and_trains(tmp_path):
    rng = np.random.default_rng(3)
    n, f = 120, 16
    edges = rng.integers(0, n, size=(400, 2)).astype(np.int64)
    feats = rng.normal(size=(n, f)).astype(np.float32)
    labels = rng.integers(0, 4, size=n).astype(np.int64)
    perm = rng.permutation(n)
    path = str(tmp_path / "toy.npz")
    np.savez(path, edges=edges, feats=feats, labels=labels,
             train_idx=perm[:80], val_idx=perm[80:100], test_idx=perm[100:])
    store = from_ogb_npz(path, max_degree=16)
    assert store.n_nodes == n and store.n_classes == 4
    assert len(store.folds["train"]) == 80

    # end-to-end: the ingested store trains through the product fit loop
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.train.trainer import TrainConfig, fit

    cfg = TrainConfig(batch_size=40, epochs=2, n_train_samples=(4, 3),
                      n_val_samples=(4, 3), output_dims=(16, 16))
    _, _, hist = fit(NodeProblem(store), cfg, log=lambda d: None)
    assert np.isfinite(hist[-1]["train_loss"])


def test_ogb_raw_csv_layout(tmp_path):
    """The ogb-package on-disk layout, numpy-only parse."""
    rng = np.random.default_rng(5)
    n, f = 60, 8
    base = tmp_path / "ogbn-toy"
    (base / "raw").mkdir(parents=True)
    (base / "split" / "sales_ranking").mkdir(parents=True)

    def w(path, arr, fmt):
        with gzip.open(path, "wt") as fh:
            np.savetxt(fh, arr, delimiter=",", fmt=fmt)

    edges = rng.integers(0, n, size=(150, 2))
    w(base / "raw" / "edge.csv.gz", edges, "%d")
    w(base / "raw" / "node-feat.csv.gz", rng.random((n, f)), "%.6f")
    w(base / "raw" / "node-label.csv.gz", rng.integers(0, 3, (n, 1)), "%d")
    perm = rng.permutation(n)
    w(base / "split" / "sales_ranking" / "train.csv.gz", perm[:40, None], "%d")
    w(base / "split" / "sales_ranking" / "valid.csv.gz", perm[40:50, None], "%d")
    w(base / "split" / "sales_ranking" / "test.csv.gz", perm[50:, None], "%d")

    store = from_ogb(str(tmp_path), "ogbn-toy", max_degree=8)
    assert store.n_nodes == n and store.feat_dim == f
    assert store.task == "classification" and store.n_classes == 3
    assert len(store.folds["train"]) == 40
    assert len(store.folds["val"]) == 10


def test_convert_cli_ogb_npz(tmp_path):
    """--format ogb-npz through the converter CLI writes a valid problem.h5."""
    rng = np.random.default_rng(7)
    n = 50
    npz = str(tmp_path / "g.npz")
    perm = rng.permutation(n)
    np.savez(npz, edges=rng.integers(0, n, (120, 2)),
             feats=rng.random((n, 6)).astype(np.float32),
             labels=rng.integers(0, 2, n),
             train_idx=perm[:30], val_idx=perm[30:40], test_idx=perm[40:])
    out = str(tmp_path / "p.h5")
    from tpu_sage.data.convert import main as convert_main

    convert_main(["--inpath", npz, "--outpath", out, "--format", "ogb-npz",
                  "--max-degree", "8"])
    from tpu_sage.data.problem import NodeProblem

    problem = NodeProblem.from_h5(out)
    assert problem.n_nodes == n
    assert problem.task == "classification"


def test_ogb_npz_regression_labels_stay_float(tmp_path):
    """Float regression labels must not be int-truncated (round-2 fix)."""
    rng = np.random.default_rng(11)
    n = 40
    path = str(tmp_path / "r.npz")
    perm = rng.permutation(n)
    labels = rng.normal(size=n).astype(np.float32)
    np.savez(path, edges=rng.integers(0, n, (100, 2)),
             feats=rng.random((n, 4)).astype(np.float32), labels=labels,
             train_idx=perm[:20], val_idx=perm[20:30], test_idx=perm[30:])
    store = from_ogb_npz(path, max_degree=8, task="regression")
    assert store.task == "regression"
    assert store.targets.dtype == np.float32
    assert store.targets.shape == (n, 1)
    np.testing.assert_allclose(store.targets[:, 0], labels, rtol=1e-6)
    assert store.n_classes == 1  # regression head width = target columns
