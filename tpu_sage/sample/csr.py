"""CSR (sparse-adjacency) neighbor sampling — the memory-lean variant.

SURVEY.md §2.1 sampler row notes the reference may carry a sparse sampler
variant [K-med]. This is the TPU formulation: adjacency as true CSR
(``indptr (n+1,)``, ``indices (nnz,)``) instead of the padded
``(n, max_degree)`` table. Memory drops from ``n·max_degree`` to ``nnz``
ids — on skewed-degree graphs with a high ``max_degree`` cap that is a
multi-× HBM saving, at the cost of an element gather per hop (B·fanout
random loads from the flat ``indices`` array).

Tradeoff, measured on v5e (RESULTS.md round 4): TPU gathers pay a per-row
descriptor cost (~7 ns/row), so the naive element gather per hop (B·fanout
descriptors) ran CSR at 55% of the dense path. The round-4 WINDOW hop
(``uniform_neighbor_sample_csr_window`` — each node's contiguous row span
fetched as two 2-D table-row gathers, then the dense sampler's one-hot
select) cut the sampling stage 2.34 → 0.66 ms/step and put CSR at **93% of
the dense path's whole-step throughput** (56.9M vs 60.9M edges/s at the
headline config) — so CSR is now a near-free memory saving wherever
``nnz < n·max_degree`` (skewed-degree graphs with a high cap).

Sampling semantics are IDENTICAL to the dense sampler: uniform with
replacement over the true neighbors, degree-0 nodes self-loop.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def csr_from_padded(
    adj: np.ndarray, degrees: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: padded ``(n, max_degree)`` table → (indptr, indices)."""
    degrees = np.asarray(degrees, dtype=np.int64)
    indptr = np.zeros(len(degrees) + 1, dtype=np.int64)
    np.cumsum(degrees, out=indptr[1:])
    if indptr[-1] >= 2**31:
        # int32 offsets would silently wrap negative and the device-side
        # clamp would return neighbors from the WRONG rows for every node
        # past the wrap point — fail loudly instead (round-5 review)
        raise ValueError(
            f"CSR nnz={int(indptr[-1])} exceeds int32 offsets (2^31-1); "
            "shard the graph first (--partitioned partitions before the "
            "per-shard CSR build, so each shard's nnz stays in range)"
        )
    mask = np.arange(adj.shape[1])[None, :] < degrees[:, None]
    indices = np.asarray(adj)[mask].astype(np.int32)
    return indptr.astype(np.int32), indices


def pad_indices_for_window(indices: np.ndarray, window: int) -> np.ndarray:
    """Pad flat CSR indices to a ``window`` row-multiple PLUS two spare rows
    — the coverage invariant of the two-row window hop (every row span
    ``[indptr[i], indptr[i] + window)`` must land inside the 2-D
    ``(m, window)`` view, including the last real row's ``q + 1`` access).
    The single place this invariant lives; used by the single-device builder
    (graph_data.to_device_csr) and the per-shard partitioner
    (dist.partition.partition_csr_arrays)."""
    pad = (-len(indices)) % window + 2 * window
    return np.concatenate([indices, np.zeros(pad, np.int32)])


def uniform_neighbor_sample_csr(
    key: jax.Array,
    indptr: jnp.ndarray,    # (n+1,) int32
    indices: jnp.ndarray,   # (nnz,) int32
    degrees: jnp.ndarray,   # (n,) int32
    ids: jnp.ndarray,       # (B,) int32
    n_samples: int,
) -> jnp.ndarray:
    """Sample ``n_samples`` neighbors per node with replacement from CSR.

    ``out[b, k] = indices[indptr[ids[b]] + floor(u·deg)]``; degree-0 nodes
    self-loop (their empty CSR row would otherwise alias the next row's
    data).
    """
    from tpu_sage.ops import row_gather_chunked

    # element gathers with elementwise consumers: chunked form overlaps the
    # descriptor streams (ops.row_gather_chunked) — the (B·k,) indices
    # gather is the CSR hop's dominant cost
    ids = ids.astype(jnp.int32)
    deg = row_gather_chunked(degrees, ids)
    safe_deg = jnp.maximum(deg, 1)
    u = jax.random.uniform(key, (ids.shape[0], n_samples))
    off = jnp.minimum(
        (u * safe_deg[:, None].astype(u.dtype)).astype(jnp.int32),
        safe_deg[:, None] - 1,
    )
    pos = row_gather_chunked(indptr, ids)[:, None] + off  # (B, k)
    nbr = row_gather_chunked(indices, pos.reshape(-1)).reshape(
        ids.shape[0], n_samples
    )
    return jnp.where(deg[:, None] == 0, ids[:, None], nbr)


def gather_window_pair(
    indptr: jnp.ndarray,    # (m+1,) int32 flat row starts
    indices: jnp.ndarray,   # flat (nnz padded) int32, or already (r, window)
    ids: jnp.ndarray,       # (N,) int32 LOCAL row indices
    window: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The CSR two-covering-row fetch: ``(pair (N, 2·window), off (N,),
    start (N,))`` such that row ``i``'s neighbors are
    ``pair[i, off[i] : off[i] + deg[i]]``.

    The ONE implementation of the window hop's core, shared by the
    single-device sampler hop below, the halo views
    (``dist.halo.CSRAdjRows``/``CSRPairRows``) and the owner-select answer
    path (``dist.halo.dist_sample_csr_owner_select``) — round-5 review: the
    sequence was re-implemented four times, each silently re-encoding
    :func:`pad_indices_for_window`'s ``q + 1`` spare-row invariant this
    relies on."""
    from tpu_sage.ops import row_gather_chunked

    table = indices if indices.ndim == 2 else indices.reshape(-1, window)
    start = row_gather_chunked(indptr, ids)
    q, off = jnp.divmod(start, window)
    pair = jnp.concatenate(
        [row_gather_chunked(table, q), row_gather_chunked(table, q + 1)],
        axis=1,
    )                                                       # (N, 2·window)
    return pair, off, start


def uniform_neighbor_sample_csr_window(
    key: jax.Array,
    indptr: jnp.ndarray,    # (n+1,) int32
    indices: jnp.ndarray,   # (nnz padded to k·window + 2·window,) int32
    degrees: jnp.ndarray,   # (n,) int32
    ids: jnp.ndarray,       # (B,) int32
    n_samples: int,
    window: int,            # static, ≥ the graph's true max degree
) -> jnp.ndarray:
    """Window-gather CSR hop: two ROW descriptors per frontier node.

    The element formulation above pays the TPU gather's per-descriptor cost
    (~7 ns/row, RESULTS.md round-3 roofline) for every SAMPLED ELEMENT —
    B·fanout descriptors per hop. A node's CSR row is contiguous in
    ``indices``, so view the flat array as a 2-D ``(m, window)`` table and
    fetch the two consecutive table rows that cover the span
    ``[indptr[id], indptr[id] + window)`` with the framework's fast 2-D row
    gather (``ops.row_gather``): 2 descriptors per node instead of fanout,
    at the same bytes/descriptor shape as the dense adjacency gather, nnz
    storage. The sampled columns then come out of the concatenated pair via
    the dense sampler's one-hot select at offset ``indptr[id] % window``.

    (A one-descriptor variant via vmapped ``dynamic_slice`` was measured
    first and REJECTED: XLA lowers the strided 1-D slice gather at 16.0
    ms/step vs 2.4 for the element form at the Reddit hop shape —
    bench_logs/r4_csr_breakdown_slicegather.log. The 2-D two-row form rides
    the same lowering as the dense sampler.)

    Bit-identical to :func:`uniform_neighbor_sample_csr` for the same key:
    both draw the same uniforms, clamp to the same columns, and read the
    same ``indices[start + col]`` values.
    """
    from tpu_sage.ops import row_gather_chunked
    from tpu_sage.sample.sampler import select_columns

    ids = ids.astype(jnp.int32)
    deg = row_gather_chunked(degrees, ids)
    pair, off, _ = gather_window_pair(indptr, indices, ids, window)
    safe_deg = jnp.maximum(deg, 1)
    u = jax.random.uniform(key, (ids.shape[0], n_samples))
    cols = jnp.minimum(
        (u * safe_deg[:, None].astype(u.dtype)).astype(jnp.int32),
        safe_deg[:, None] - 1,
    )
    nbr = select_columns(pair, off[:, None] + cols)
    return jnp.where(deg[:, None] == 0, ids[:, None], nbr)


def sample_tree_csr(
    key: jax.Array,
    indptr: jnp.ndarray,
    indices: jnp.ndarray,
    degrees: jnp.ndarray,
    ids: jnp.ndarray,
    fanouts: Sequence[int],
    window: int = 0,
) -> List[jnp.ndarray]:
    """``sample_tree`` against CSR storage; same level-shape contract.
    ``window`` > 0 selects the window-gather hop (the measured default —
    CSRDeviceGraph.window); 0 the element-gather formulation."""
    levels = [ids.astype(jnp.int32)]
    for fanout in fanouts:
        key, sub = jax.random.split(key)
        if window > 0:
            nbr = uniform_neighbor_sample_csr_window(
                sub, indptr, indices, degrees, levels[-1], fanout, window
            )
        else:
            nbr = uniform_neighbor_sample_csr(
                sub, indptr, indices, degrees, levels[-1], fanout
            )
        levels.append(nbr.reshape(-1))
    return levels


def graph_sample_tree(key, graph, ids, fanouts):
    """Storage-dispatching ``sample_tree``: dense padded table or CSR.

    The dispatch is on pytree structure (``indptr`` presence), resolved at
    trace time — both graph types flow through the same jit'd trainer."""
    from tpu_sage.sample.sampler import sample_tree

    if hasattr(graph, "indptr"):
        return sample_tree_csr(key, graph.indptr, graph.indices,
                               graph.degrees, ids, fanouts,
                               window=getattr(graph, "window", 0))
    return sample_tree(key, graph.adj, graph.degrees, ids, fanouts)


class CSRNeighborSampler:
    """Object wrapper mirroring ``UniformNeighborSampler``'s API over CSR."""

    def __init__(self, indptr: jnp.ndarray, indices: jnp.ndarray,
                 degrees: jnp.ndarray):
        self.indptr = indptr
        self.indices = indices
        self.degrees = degrees

    @classmethod
    def from_padded(cls, adj, degrees) -> "CSRNeighborSampler":
        indptr, indices = csr_from_padded(np.asarray(adj), np.asarray(degrees))
        return cls(jnp.asarray(indptr), jnp.asarray(indices),
                   jnp.asarray(degrees, jnp.int32))

    def __call__(self, key: jax.Array, ids: jnp.ndarray, n_samples: int) -> jnp.ndarray:
        return uniform_neighbor_sample_csr(
            key, self.indptr, self.indices, self.degrees, ids, n_samples
        )
