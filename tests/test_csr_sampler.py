"""CSR (sparse-adjacency) sampler variant: identical semantics to the padded
dense sampler at a fraction of the memory (SURVEY.md §2.1 sampler row)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from tpu_sage.data.synthetic import sbm_store
from tpu_sage.graph.graph_data import build_padded_adjacency
from tpu_sage.sample.csr import (CSRNeighborSampler, csr_from_padded,
                                 sample_tree_csr, uniform_neighbor_sample_csr)
from tpu_sage.sample.sampler import sample_tree


def _toy():
    edges = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [2, 3]])
    adj, deg = build_padded_adjacency(edges, 6, max_degree=4)  # node 4,5 isolated
    return adj, deg


def test_csr_from_padded_roundtrip():
    adj, deg = _toy()
    indptr, indices = csr_from_padded(adj, deg)
    assert indptr[-1] == deg.sum() == len(indices)
    for v in range(6):
        got = set(indices[indptr[v]:indptr[v + 1]].tolist())
        want = set(adj[v, :deg[v]].tolist())
        assert got == want, v


def test_csr_membership_and_selfloop():
    adj, deg = _toy()
    s = CSRNeighborSampler.from_padded(adj, deg)
    ids = jnp.arange(6, dtype=jnp.int32)
    out = np.asarray(s(jax.random.key(0), ids, 8))
    indptr, indices = csr_from_padded(adj, deg)
    for v in range(6):
        if deg[v] == 0:
            assert (out[v] == v).all()  # isolated nodes self-loop
        else:
            true_nbrs = set(indices[indptr[v]:indptr[v + 1]].tolist())
            assert set(out[v].tolist()) <= true_nbrs


def test_csr_uniformity_chi2():
    """Each true neighbor drawn with equal probability (χ² over many draws)."""
    adj, deg = _toy()
    s = CSRNeighborSampler.from_padded(adj, deg)
    ids = jnp.zeros((2000,), jnp.int32)  # node 0, degree 3
    out = np.asarray(s(jax.random.key(1), ids, 4)).reshape(-1)
    counts = [int((out == v).sum()) for v in (1, 2, 3)]
    assert sum(counts) == out.size
    _, p = stats.chisquare(counts)
    assert p > 0.001, counts


def test_csr_tree_matches_dense_shapes_and_membership():
    store = sbm_store(n_nodes=300, n_classes=3, feat_dim=8, seed=3)
    indptr, indices = csr_from_padded(store.adj, store.degrees)
    ids = jnp.asarray(np.arange(32), jnp.int32)
    levels_csr = sample_tree_csr(
        jax.random.key(2), jnp.asarray(indptr), jnp.asarray(indices),
        jnp.asarray(store.degrees, jnp.int32), ids, (5, 3),
    )
    levels_dense = sample_tree(
        jax.random.key(2), jnp.asarray(store.adj),
        jnp.asarray(store.degrees, jnp.int32), ids, (5, 3),
    )
    assert [l.shape for l in levels_csr] == [l.shape for l in levels_dense]
    # membership: every sampled id at level l+1 is a true neighbor of its
    # parent at level l (or a self-loop for isolated parents)
    for l in range(2):
        parents = np.repeat(np.asarray(levels_csr[l]), (5, 3)[l])
        children = np.asarray(levels_csr[l + 1])
        for p, c in zip(parents[:100], children[:100]):
            d = store.degrees[p]
            if d == 0:
                assert c == p
            else:
                assert c in set(indices[indptr[p]:indptr[p] + d].tolist())


def test_csr_memory_is_smaller():
    store = sbm_store(n_nodes=500, n_classes=3, feat_dim=8, seed=5)
    indptr, indices = csr_from_padded(store.adj, store.degrees)
    assert len(indices) + len(indptr) < store.adj.size  # nnz < n*max_degree


def test_fit_with_csr_adjacency():
    """The full product fit loop runs on CSR storage and converges."""
    from tpu_sage.data.synthetic import sbm_problem
    from tpu_sage.train.trainer import TrainConfig, fit

    problem = sbm_problem(n_nodes=400, n_classes=4, feat_dim=16, seed=21)
    cfg = TrainConfig(batch_size=64, epochs=4, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32))
    _, _, hist = fit(problem, cfg, log=lambda d: None, csr=True)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert hist[-1]["val_metric"] > 0.8


def test_csr_window_hop_bitwise_matches_element_hop():
    """The round-4 window-gather hop (one descriptor per frontier node —
    uniform_neighbor_sample_csr_window) returns BIT-IDENTICAL samples to the
    element formulation for the same key: same uniforms, same clamped
    columns, same indices[start + col] reads."""
    from tpu_sage.sample.csr import uniform_neighbor_sample_csr_window

    store = sbm_store(n_nodes=400, n_classes=3, feat_dim=8, avg_degree=7,
                      seed=31)
    from tpu_sage.sample.csr import pad_indices_for_window

    indptr, indices = csr_from_padded(store.adj, store.degrees)
    window = max(1, int(store.degrees.max()))
    indices_pad = jnp.asarray(pad_indices_for_window(indices, window))
    indptr_d = jnp.asarray(indptr)
    deg_d = jnp.asarray(store.degrees, jnp.int32)
    ids = jnp.asarray(np.arange(0, 400, 3), jnp.int32)
    for k in range(3):
        key = jax.random.key(k)
        a = uniform_neighbor_sample_csr(key, indptr_d, indices_pad, deg_d,
                                        ids, 6)
        b = uniform_neighbor_sample_csr_window(key, indptr_d, indices_pad,
                                               deg_d, ids, 6, window)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_csr_window_covers_isolated_and_tail_nodes():
    """degree-0 self-loop and the LAST node's row (slice at the very end of
    indices — covered by the window padding, never clamped)."""
    from tpu_sage.sample.csr import uniform_neighbor_sample_csr_window

    edges = np.array([[0, 1], [1, 2], [3, 0]])
    adj, deg = build_padded_adjacency(edges, 5, max_degree=4)
    from tpu_sage.sample.csr import pad_indices_for_window

    indptr, indices = csr_from_padded(adj, deg)
    window = max(1, int(deg.max()))
    indices_pad = jnp.asarray(pad_indices_for_window(indices, window))
    out = np.asarray(uniform_neighbor_sample_csr_window(
        jax.random.key(0), jnp.asarray(indptr), indices_pad,
        jnp.asarray(deg, jnp.int32), jnp.asarray([3, 4], jnp.int32), 5,
        window,
    ))
    assert (out[0] == 0).all()   # node 3's only neighbor
    assert (out[1] == 4).all()   # isolated node self-loops


def test_fit_with_csr_window_default():
    """to_device_csr now ships the window hop by default (window = true max
    degree, indices padded); the product path trains and validates."""
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.train.trainer import TrainConfig, fit

    store = sbm_store(n_nodes=400, n_classes=3, feat_dim=16, avg_degree=6,
                      seed=33)
    problem = NodeProblem(store)
    graph = problem.device_graph(train=True, csr=True)
    assert graph.window == int(store.train_degrees.max())
    from tpu_sage.sample.csr import pad_indices_for_window

    nnz = int(store.train_degrees.sum())
    assert graph.indices.shape[0] == len(
        pad_indices_for_window(np.zeros(nnz, np.int32), graph.window))
    assert graph.indices.shape[0] % graph.window == 0
    cfg = TrainConfig(batch_size=64, epochs=3, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(16, 16), lr_init=0.01)
    _, _, hist = fit(problem, cfg, log=lambda d: None, csr=True)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert hist[-1]["val_metric"] > 0.8


def test_exact_val_with_csr_densifies_eval_graph():
    """--exact-val + --csr-adjacency: round-4 closes the silent fallback —
    the eval pass densifies the full graph (logged) and the exact metric
    equals a manual dense-graph recomputation; training stays CSR."""
    import numpy as np

    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.nn.full_graph import embed_all_nodes
    from tpu_sage.train.trainer import TrainConfig, fit, fold_metric_np

    store = sbm_store(n_nodes=400, n_classes=3, feat_dim=16, avg_degree=6,
                      seed=35)
    problem = NodeProblem(store)
    cfg = TrainConfig(batch_size=64, epochs=2, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(16, 16),
                      lr_init=0.01, exact_val=True)
    notes = []
    trainer, state, hist = fit(problem, cfg, log=notes.append, csr=True)
    assert any("densifies" in str(r.get("note", "")) for r in notes)
    assert not any("falling back" in str(r.get("note", "")) for r in notes)
    graph_full = problem.device_graph(train=False)
    logits = np.asarray(embed_all_nodes(trainer.model, state.params,
                                        graph_full, with_head=True))
    val_ids = problem.folds["val"]
    want = fold_metric_np(problem.task, logits[val_ids],
                          store.targets[val_ids])
    assert hist[-1]["val_metric"] == want
