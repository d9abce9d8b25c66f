"""Property-based sampler tests (hypothesis): invariants hold on arbitrary
random graphs, not just the hand-built fixtures."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from tpu_sage.graph.graph_data import build_padded_adjacency
from tpu_sage.data.problem import infer_degrees
from tpu_sage.sample.sampler import uniform_neighbor_sample


@st.composite
def random_graph(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    n_edges = draw(st.integers(min_value=0, max_value=120))
    max_degree = draw(st.sampled_from([2, 4, 8]))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    if n_edges:
        e = np.stack([rng.integers(0, n, n_edges), rng.integers(0, n, n_edges)], 1)
        e = e[e[:, 0] != e[:, 1]]
    else:
        e = np.zeros((0, 2), dtype=np.int64)
    return e, n, max_degree, seed


@given(random_graph(), st.integers(min_value=1, max_value=6),
       st.integers(min_value=0, max_value=1000))
@settings(max_examples=25, deadline=None)
def test_samples_always_valid(graph, fanout, key_seed):
    edges, n, max_degree, seed = graph
    adj, deg = build_padded_adjacency(edges, n, max_degree,
                                      np.random.default_rng(seed))
    # invariant 0: adjacency construction is well-formed
    assert adj.shape == (n, max_degree) and (0 <= adj).all() and (adj < n).all()
    assert (deg <= max_degree).all() and (deg >= 0).all()
    np.testing.assert_array_equal(infer_degrees(adj), deg)

    ids = jnp.arange(n, dtype=jnp.int32)
    out = np.asarray(
        uniform_neighbor_sample(jax.random.key(key_seed), jnp.asarray(adj),
                                jnp.asarray(deg), ids, fanout)
    )
    assert out.shape == (n, fanout)
    for v in range(n):
        if deg[v] == 0:
            assert (out[v] == v).all()  # isolated node self-loops
        else:
            true_nbrs = set(adj[v, : deg[v]].tolist())
            assert set(out[v].tolist()) <= true_nbrs
