"""On-device sampler: validity, distribution, edge cases (SURVEY.md §4.2 #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from tpu_sage.graph.graph_data import build_padded_adjacency
from tpu_sage.sample.sampler import sample_tree, uniform_neighbor_sample


def _graph():
    edges = np.array(
        [[0, 1], [0, 2], [0, 3], [1, 2], [2, 3]]
    )
    adj, deg = build_padded_adjacency(edges, 5, max_degree=4)
    return jnp.asarray(adj), jnp.asarray(deg)


def test_samples_are_true_neighbors():
    adj, deg = _graph()
    key = jax.random.key(0)
    ids = jnp.array([0, 1, 2, 3], dtype=jnp.int32)
    out = uniform_neighbor_sample(key, adj, deg, ids, 16)
    assert out.shape == (4, 16)
    adj_np, deg_np = np.asarray(adj), np.asarray(deg)
    for row, node in zip(np.asarray(out), [0, 1, 2, 3]):
        true_nbrs = set(adj_np[node, : deg_np[node]].tolist())
        assert set(row.tolist()) <= true_nbrs


def test_degree_zero_self_loops():
    adj, deg = _graph()  # node 4 isolated
    out = uniform_neighbor_sample(jax.random.key(1), adj, deg, jnp.array([4], jnp.int32), 8)
    assert (np.asarray(out) == 4).all()


def test_degree_less_than_fanout_with_replacement():
    adj, deg = _graph()  # node 1 has degree 2, fanout 8 -> repeats allowed
    out = np.asarray(
        uniform_neighbor_sample(jax.random.key(2), adj, deg, jnp.array([1], jnp.int32), 8)
    )
    assert set(out[0].tolist()) <= {0, 2}
    assert len(out[0]) == 8


def test_uniformity_chi2():
    """χ² test that column selection is uniform over true neighbors."""
    n, d = 1, 10
    edges = np.array([[0, i] for i in range(1, d + 1)])
    adj, deg = build_padded_adjacency(edges, d + 1, max_degree=16, symmetrize=False)
    adj, deg = jnp.asarray(adj), jnp.asarray(deg)
    draws = 20000
    out = np.asarray(
        uniform_neighbor_sample(
            jax.random.key(3), adj, deg, jnp.zeros(draws, jnp.int32), 1
        )
    ).ravel()
    counts = np.bincount(out, minlength=d + 1)[1:]
    assert counts.sum() == draws
    _, pvalue = scipy.stats.chisquare(counts)
    assert pvalue > 1e-4, f"sampling not uniform: counts={counts}"


def test_sample_tree_shapes():
    adj, deg = _graph()
    ids = jnp.array([0, 1, 2], dtype=jnp.int32)
    levels = sample_tree(jax.random.key(4), adj, deg, ids, (5, 3))
    assert [l.shape[0] for l in levels] == [3, 15, 45]
    assert all(l.ndim == 1 for l in levels)


def test_sampler_jit_and_determinism():
    adj, deg = _graph()
    f = jax.jit(lambda k, i: uniform_neighbor_sample(k, adj, deg, i, 4))
    ids = jnp.array([0, 2], jnp.int32)
    a = f(jax.random.key(7), ids)
    b = f(jax.random.key(7), ids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = f(jax.random.key(8), ids)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_packed_tree_matches_unpacked():
    """sample_tree_packed draws the SAME samples as sample_tree for the same
    key (interchangeable hot-path implementations)."""
    from tpu_sage.sample.sampler import (gather_levels, pack_adjacency,
                                         sample_tree_packed)

    adj, deg = _graph()
    ids = jnp.array([0, 1, 2], dtype=jnp.int32)
    key = jax.random.key(9)
    a = sample_tree(key, adj, deg, ids, (5, 3))
    b = sample_tree_packed(key, pack_adjacency(adj, deg), ids, (5, 3))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    feats = jnp.arange(5 * 4, dtype=jnp.float32).reshape(5, 4)
    gathered = gather_levels(feats, a)
    for lvl, g in zip(a, gathered):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(feats[lvl]))
