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
    """Paper protocol (SURVEY.md §7.2 M3): train encoder unsupervised, fit a
    logistic probe on train-fold embeddings, check val accuracy ≫ chance."""
    problem = sbm_problem(n_nodes=600, n_classes=4, feat_dim=32, avg_degree=8,
                          p_in=0.95, feat_noise=1.0, seed=11)
    cfg = TrainConfig(batch_size=128, epochs=3, n_train_samples=(8, 4),
                      n_val_samples=(8, 4), output_dims=(32, 32), lr_init=0.005)
    trainer, state, hist = fit_unsupervised(
        problem, cfg, UnsupConfig(walk_length=2, n_negatives=5),
        log=lambda d: None,
    )
    assert hist[-1]["unsup_loss"] < hist[0]["unsup_loss"]

    graph = problem.device_graph(train=False)
    train_ids = problem.folds["train"]
    val_ids = problem.folds["val"]
    z_train = trainer.embed_all(state.params, graph, train_ids)
    z_val = trainer.embed_all(state.params, graph, val_ids)
    y = problem.store.targets
    probe = LogisticRegression(max_iter=500).fit(z_train, y[train_ids])
    acc = probe.score(z_val, y[val_ids])
    assert acc > 0.6, acc  # chance = 0.25
