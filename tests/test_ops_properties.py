"""Property-based tests for the chunked/fused gather ops: chunk slicing is
element-identical to the single gather for ARBITRARY (rows, chunks,
threshold, fanout) combinations, not just the hand-picked remainder cases in
test_ops.py."""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

import tpu_sage.ops as ops


@st.composite
def gather_case(draw):
    n_table = draw(st.integers(min_value=1, max_value=50))
    n_ids = draw(st.integers(min_value=1, max_value=200))
    n_chunks = draw(st.integers(min_value=1, max_value=7))
    min_rows = draw(st.sampled_from([1, 4, 64, 4096]))
    width = draw(st.sampled_from([1, 3, 8]))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return n_table, n_ids, n_chunks, min_rows, width, seed


@given(gather_case())
@settings(max_examples=60, deadline=None)
def test_row_gather_chunked_always_matches(monkeypatch_case):
    n_table, n_ids, n_chunks, min_rows, width, seed = monkeypatch_case
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.standard_normal((n_table, width)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, n_table, size=n_ids), jnp.int32)
    # n_chunks is an explicit argument now (config-driven); only the size
    # threshold remains a module constant (hypothesis runs many examples per
    # test call, so pytest's monkeypatch fixture can't scope it)
    old = ops._CHUNK_MIN_ROWS
    try:
        ops._CHUNK_MIN_ROWS = min_rows
        got = np.asarray(ops.row_gather_chunked(table, ids, n_chunks=n_chunks))
    finally:
        ops._CHUNK_MIN_ROWS = old
    np.testing.assert_array_equal(got, np.asarray(table[ids]))


@st.composite
def fanout_case(draw):
    n_table = draw(st.integers(min_value=1, max_value=40))
    n_roots = draw(st.integers(min_value=1, max_value=30))
    fanout = draw(st.integers(min_value=1, max_value=9))
    n_chunks = draw(st.integers(min_value=1, max_value=6))
    min_rows = draw(st.sampled_from([1, 8, 4096]))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return n_table, n_roots, fanout, n_chunks, min_rows, seed


@given(fanout_case())
@settings(max_examples=60, deadline=None)
def test_row_gather_fanout_mean_always_matches(case):
    n_table, n_roots, fanout, n_chunks, min_rows, seed = case
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.standard_normal((n_table, 4)), jnp.float32)
    ids = jnp.asarray(
        rng.integers(0, n_table, size=n_roots * fanout), jnp.int32
    )
    old = ops._CHUNK_MIN_ROWS
    try:
        ops._CHUNK_MIN_ROWS = min_rows
        got = np.asarray(
            ops.row_gather_fanout_mean(table, ids, fanout, n_chunks=n_chunks)
        )
    finally:
        ops._CHUNK_MIN_ROWS = old
    want = np.asarray(table[ids]).reshape(n_roots, fanout, -1).mean(axis=1)
    assert got.shape == (n_roots, 4)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
