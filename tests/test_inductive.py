"""Cross-graph inductive inference: train on graph A, infer on DISJOINT graph B.

The paper's headline claim (SURVEY.md §0.1 "inductive representation
learning") and the point of the graph-size-independent preps: a model trained
with identity/linear prep on one graph must embed/classify nodes of a graph
it never saw. Two SBM stores share one generative process (same
``centroid_seed`` → same class→feature mapping) but differ in every node,
edge, size and structural seed; the exporter is driven through its supported
path (``export.py --problem-path b.h5 --checkpoint a.npz``).

The transductive ``node_embedding`` prep must refuse with a clear error
instead of shape-crashing (VERDICT r4 missing #2).
"""

import json

import numpy as np
import pytest

CENTROID_SEED = 777
N_CLASSES = 5
FEAT_DIM = 32


def _store(n_nodes, seed):
    from tpu_sage.data.synthetic import sbm_store

    return sbm_store(
        n_nodes=n_nodes, n_classes=N_CLASSES, feat_dim=FEAT_DIM,
        seed=seed, centroid_seed=CENTROID_SEED,
    )


def _train_a(tmp_path, prep_class="identity", epochs=3):
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.train.trainer import TrainConfig, fit

    ckpt = tmp_path / f"model_{prep_class}.npz"
    config = TrainConfig(
        prep_class=prep_class,
        n_train_samples=(5, 4), n_val_samples=(5, 4),
        output_dims=(16, 16), batch_size=64, epochs=epochs,
    )
    problem = NodeProblem(_store(500, seed=0))
    fit(problem, config, log=lambda d: None,
        resume_from=str(ckpt), checkpoint_every=1)
    assert ckpt.exists()
    return ckpt


@pytest.fixture(scope="module")
def graph_b_h5(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("inductive")
    from tpu_sage.data.convert import save_problem_h5

    store_b = _store(800, seed=9)
    path = tmp / "b_problem.h5"
    save_problem_h5(store_b, str(path))
    return path, store_b


def test_cross_graph_transfer_accuracy(tmp_path, graph_b_h5, capsys):
    """Train on A (500 nodes), classify every node of B (800 nodes, disjoint)
    from the checkpoint alone — accuracy must beat chance by a wide margin."""
    from tpu_sage.export import main

    b_path, store_b = graph_b_h5
    ckpt = _train_a(tmp_path)
    out = tmp_path / "b_logits.npy"
    assert main([
        "--problem-path", str(b_path), "--checkpoint", str(ckpt),
        "--out", str(out), "--logits", "--checkpoint-config",
        "--chunk", "128",
    ]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["kind"] == "logits" and meta["from_step"] > 0
    logits = np.load(out)
    assert logits.shape == (800, N_CLASSES) and np.isfinite(logits).all()
    acc = float((logits.argmax(-1) == store_b.targets).mean())
    # chance = 0.2 over 5 classes; the shared generative process makes the
    # transfer easy — anything near chance means params didn't transfer
    assert acc > 0.5, f"cross-graph accuracy {acc} barely beats chance"


def test_cross_graph_embeddings_probe(tmp_path, graph_b_h5, capsys):
    """The unsupervised serving contract on B: exported embeddings feed a
    linear probe trained on B's train fold, evaluated on B's val fold."""
    from tpu_sage.export import main

    b_path, store_b = graph_b_h5
    ckpt = _train_a(tmp_path)
    out = tmp_path / "b_emb.npy"
    assert main([
        "--problem-path", str(b_path), "--checkpoint", str(ckpt),
        "--out", str(out), "--checkpoint-config", "--chunk", "128",
    ]) == 0
    capsys.readouterr()
    emb = np.load(out)
    assert emb.shape[0] == 800 and np.isfinite(emb).all()
    from sklearn.linear_model import LogisticRegression

    tr, va = store_b.folds["train"], store_b.folds["val"]
    clf = LogisticRegression(max_iter=200).fit(emb[tr], store_b.targets[tr])
    acc = clf.score(emb[va], store_b.targets[va])
    assert acc > 0.5, f"probe accuracy on B {acc}"


def test_node_embedding_prep_refuses_cross_graph(tmp_path, graph_b_h5):
    """Transductive prep + different graph → clear inductive-story error,
    not a shape crash."""
    from tpu_sage.export import main

    b_path, _ = graph_b_h5
    ckpt = _train_a(tmp_path, prep_class="node_embedding", epochs=1)
    with pytest.raises(SystemExit, match="TRANSDUCTIVE"):
        main([
            "--problem-path", str(b_path), "--checkpoint", str(ckpt),
            "--out", str(tmp_path / "nope.npy"), "--checkpoint-config",
        ])
