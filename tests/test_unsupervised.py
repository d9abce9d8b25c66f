"""Unsupervised head: walks stay on-graph, NCE loss math, downstream probe."""

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.linear_model import LogisticRegression

from tpu_sage.data.synthetic import sbm_problem
from tpu_sage.graph.graph_data import build_padded_adjacency
from tpu_sage.train.trainer import TrainConfig
from tpu_sage.train.unsupervised import (
    UnsupConfig,
    fit_unsupervised,
    nce_loss,
    random_walk,
)


def test_random_walk_stays_on_graph():
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 0]])  # 4-cycle + isolated 4
    adj, deg = build_padded_adjacency(edges, 5, max_degree=4)
    adj, deg = jnp.asarray(adj), jnp.asarray(deg)
    ids = jnp.array([0, 1, 2, 3, 4], jnp.int32)
    out = np.asarray(random_walk(jax.random.key(0), adj, deg, ids, length=7))
    assert out.shape == (5,)
    # cycle parity: odd-length walk from node i lands on opposite parity
    assert all(o in (0, 1, 2, 3) for o in out[:4])
    assert all((o - i) % 2 == 1 for i, o in zip(range(4), out[:4]))
    assert out[4] == 4  # isolated node self-loops forever


def test_nce_loss_math():
    z_u = jnp.array([[1.0, 0.0]])
    z_pos = jnp.array([[1.0, 0.0]])
    z_neg = jnp.array([[[-1.0, 0.0]]])
    # pos logit 1, neg logit -1: loss = -log σ(1) - log σ(1)
    expected = -2 * float(jax.nn.log_sigmoid(1.0))
    np.testing.assert_allclose(float(nce_loss(z_u, z_pos, z_neg)), expected, rtol=1e-6)


def test_unsupervised_embeddings_are_useful():
    """Paper protocol (SURVEY.md §7.2 M3), with the VERDICT-r2 #9 gate: the
    unsupervised probe must reach ≥ 0.8× the SUPERVISED val accuracy on the
    same graph/seed (a regression that halves embedding quality fails), and
    the probe metric is recorded in fit_unsupervised's own history."""
    from tpu_sage.train.trainer import fit

    problem = sbm_problem(n_nodes=600, n_classes=4, feat_dim=32, avg_degree=8,
                          p_in=0.95, feat_noise=1.0, seed=11)
    cfg = TrainConfig(batch_size=128, epochs=3, n_train_samples=(8, 4),
                      n_val_samples=(8, 4), output_dims=(32, 32), lr_init=0.005)
    trainer, state, hist = fit_unsupervised(
        problem, cfg, UnsupConfig(walk_length=2, n_negatives=5),
        log=lambda d: None,
    )
    assert hist[-1]["unsup_loss"] < hist[0]["unsup_loss"]
    # the probe lives in the training history now, not only the CLI layer
    acc = hist[-1]["probe_val_accuracy"]

    _, _, sup_hist = fit(problem, cfg.replace(lr_init=0.01),
                         log=lambda d: None)
    sup_acc = sup_hist[-1]["val_metric"]
    assert acc >= 0.8 * sup_acc, (acc, sup_acc)

    # the recorded probe equals the manual protocol (same embeddings)
    graph = problem.device_graph(train=False)
    train_ids = problem.folds["train"]
    val_ids = problem.folds["val"]
    z_train = trainer.embed_all(state.params, graph, train_ids)
    z_val = trainer.embed_all(state.params, graph, val_ids)
    y = problem.store.targets
    probe = LogisticRegression(max_iter=500).fit(z_train, y[train_ids])
    manual = probe.score(z_val, y[val_ids])
    assert abs(acc - manual) < 0.05, (acc, manual)


def test_walk_corpus_mode(tmp_path):
    """h5 walks dataset → corpus-positive unsupervised training (reference
    walks.txt analog, SURVEY.md §3.4)."""
    from tpu_sage.data.convert import generate_walks, save_problem_h5
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import sbm_store
    from tpu_sage.train.trainer import TrainConfig
    from tpu_sage.train.unsupervised import fit_unsupervised

    store = sbm_store(n_nodes=300, n_classes=3, feat_dim=16, seed=23)
    walks = generate_walks(store.train_adj, store.train_degrees,
                           np.arange(store.n_nodes), n_walks=4, walk_len=4, seed=1)
    assert walks.shape == (300, 4, 5)
    # corpus walks stay on the train graph and start at the right node
    assert (walks[:, :, 0] == np.arange(300)[:, None]).all()
    path = str(tmp_path / "p.h5")
    save_problem_h5(store, path, walks=walks)
    problem = NodeProblem.from_h5(path)
    assert problem.walks is not None and problem.walks.shape == (300, 4, 5)

    cfg = TrainConfig(batch_size=64, epochs=2, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(16, 16), lr_init=0.01)
    _, _, hist = fit_unsupervised(problem, cfg, log=lambda d: None)
    assert hist[-1]["unsup_loss"] < hist[0]["unsup_loss"]


def test_unsupervised_checkpoint_resume(tmp_path):
    """Periodic checkpoint + exact-epoch resume through fit_unsupervised
    (round-2 gap: the single-device unsupervised path now has the same
    crash protection as every other fit loop)."""
    problem = sbm_problem(n_nodes=300, n_classes=3, feat_dim=16, seed=29)
    cfg = TrainConfig(batch_size=64, epochs=2, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(16, 16))
    ckpt = str(tmp_path / "u.npz")
    recs = []
    fit_unsupervised(problem, cfg, UnsupConfig(walk_length=2),
                     log=recs.append, resume_from=ckpt, checkpoint_every=1)
    assert any("checkpoint" in r for r in recs)
    recs2 = []
    fit_unsupervised(problem, cfg.replace(epochs=4), UnsupConfig(walk_length=2),
                     log=recs2.append, resume_from=ckpt, checkpoint_every=1)
    resumed = next(r for r in recs2 if "resumed_from" in r)
    assert resumed["start_epoch"] == 2
    assert [r["epoch"] for r in recs2 if "epoch" in r] == [2, 3]


def test_unsupervised_small_fold_clamps_batch():
    """A train fold smaller than batch_size trains instead of crashing on
    the epoch scan's reshape (round-3 weak #5) — same clamp as fit."""
    problem = sbm_problem(n_nodes=60, n_classes=3, feat_dim=8, avg_degree=5,
                          seed=7)
    cfg = TrainConfig(batch_size=512, epochs=2, n_train_samples=(4, 3),
                      n_val_samples=(4, 3), output_dims=(16, 16))
    recs = []
    _, _, hist = fit_unsupervised(
        problem, cfg, UnsupConfig(walk_length=2, n_negatives=3),
        log=recs.append,
    )
    assert len(hist) == 2
    assert any("clamped" in str(r.get("note", "")) for r in recs)


def test_unsupervised_probe_every_thinning():
    """probe_every=K records the probe on every K-th epoch only (and the
    final epoch gets one either way — here epoch 3 is both)."""
    problem = sbm_problem(n_nodes=300, n_classes=3, feat_dim=16, avg_degree=6,
                          seed=17)
    cfg = TrainConfig(batch_size=64, epochs=4, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(16, 16))
    _, _, hist = fit_unsupervised(
        problem, cfg, UnsupConfig(walk_length=2, n_negatives=3, probe_every=2),
        log=lambda d: None,
    )
    assert ["probe_val_accuracy" in h for h in hist] == [False, True, False, True]


def test_unsupervised_patience_and_save_best(tmp_path):
    """patience/save_best key on the logistic-probe metric (round-3 missing
    #3: the unsupervised loops get the supervised surface): training stops
    before the epoch budget once the probe plateaus, and the checkpoint
    holds the best-probe state."""
    import os

    problem = sbm_problem(n_nodes=400, n_classes=3, feat_dim=32, avg_degree=8,
                          p_in=0.95, feat_noise=0.3, seed=13)
    ck = str(tmp_path / "u.npz")
    cfg = TrainConfig(batch_size=64, epochs=20, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32),
                      lr_init=0.005, patience=2, save_best=True)
    recs = []
    _, _, hist = fit_unsupervised(
        problem, cfg, UnsupConfig(walk_length=2, n_negatives=5),
        log=recs.append, resume_from=ck,
    )
    # patience/save_best auto-enable per-epoch probing
    assert all("probe_val_accuracy" in h for h in hist)
    assert len(hist) < 20
    assert any(r.get("early_stop") for r in recs)
    assert os.path.exists(ck)
    best_writes = [r for r in recs if "checkpoint_best" in r]
    assert best_writes
    assert best_writes[-1]["val_metric"] == max(
        h["probe_val_accuracy"] for h in hist
    )


def test_unsupervised_patience_inactive_without_probe():
    """On tasks with no probe metric the tracker deactivates LOUDLY instead
    of silently never stopping."""
    problem = sbm_problem(n_nodes=200, n_classes=3, feat_dim=8, avg_degree=5,
                          task="regression", seed=19)
    cfg = TrainConfig(batch_size=64, epochs=2, n_train_samples=(4, 2),
                      n_val_samples=(4, 2), output_dims=(16, 16), patience=2)
    recs = []
    _, _, hist = fit_unsupervised(
        problem, cfg, UnsupConfig(walk_length=2, n_negatives=3),
        log=recs.append,
    )
    assert len(hist) == 2
    assert any("patience/save_best inactive" in str(r.get("note", ""))
               for r in recs)


def test_unsupervised_with_csr_adjacency():
    """Round 4: the unsupervised loop runs on CSR storage (window hop) —
    walks, the NCE tree, and the probe all dispatch on the graph type."""
    problem = sbm_problem(n_nodes=400, n_classes=3, feat_dim=16, avg_degree=6,
                          p_in=0.9, seed=37)
    cfg = TrainConfig(batch_size=64, epochs=3, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(16, 16),
                      lr_init=0.005)
    _, _, hist = fit_unsupervised(
        problem, cfg, UnsupConfig(walk_length=2, n_negatives=5),
        log=lambda d: None, csr=True,
    )
    assert hist[-1]["unsup_loss"] < hist[0]["unsup_loss"]
    assert hist[-1]["probe_val_accuracy"] > 0.5


def test_graph_random_walk_csr_stays_on_graph():
    """CSR walk dispatch: final nodes are graph-reachable; isolated nodes
    self-loop (same contract as the dense random_walk test)."""
    import jax.numpy as jnp

    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import sbm_store
    from tpu_sage.train.unsupervised import graph_random_walk

    store = sbm_store(n_nodes=200, n_classes=3, feat_dim=8, avg_degree=5,
                      seed=39)
    problem = NodeProblem(store)
    g_csr = problem.device_graph(train=True, csr=True)
    g_dense = problem.device_graph(train=True)
    ids = jnp.arange(0, 200, 7, dtype=jnp.int32)
    out_csr = np.asarray(graph_random_walk(jax.random.key(3), g_csr, ids, 4))
    out_dense = np.asarray(graph_random_walk(jax.random.key(3), g_dense, ids, 4))
    assert out_csr.shape == out_dense.shape == (len(np.asarray(ids)),)
    assert ((0 <= out_csr) & (out_csr < 200)).all()
