"""Graph partitioning for the node-sharded training path (SURVEY.md §2.3).

Contiguous range partition: shard ``s`` owns global node ids
``[s·m, (s+1)·m)`` where ``m = ceil(n/n_shards)``; the node axis of every
per-node array (adjacency, degrees, features, targets) is padded to
``n_shards·m`` and sharded over the ``data`` mesh axis. Padding rows are
degree-0 self-loops with zero features — never sampled because fold ids only
reference real nodes.

Ownership is then a pure function of the id (``owner = id // m``) — no lookup
table to replicate, which is what keeps the halo-exchange routing
(tpu_sage.dist.halo) a couple of integer ops. Reordering passes slot in
front of this without changing anything downstream (compose with
:func:`reorder_store`): :func:`degree_balanced_permutation` balances edges
across shards, :func:`locality_permutation` co-locates neighborhoods to cut
cross-shard halo queries (measured by :func:`edge_cut_fraction`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_sage.graph.graph_data import DeviceGraph, GraphStore


def pad_to_shards(n_nodes: int, n_shards: int) -> Tuple[int, int]:
    m = -(-n_nodes // n_shards)
    return m, m * n_shards


def put_sharded(x, mesh: Mesh, spec: P):
    """Place a host array with the given PartitionSpec — multi-host-safe.

    Single-process: a plain ``device_put``. Multi-process: ``device_put``
    cannot target non-addressable devices, so each process contributes its
    addressable shards via ``make_array_from_callback`` (every process holds
    the full host array — the replicated-ETL pattern this framework uses:
    each process loads the same problem file / synthesizes the same store).
    This is the single placement seam that makes ``shard_graph``, the fold
    tables, and the eval inputs work unchanged on cross-process meshes
    (SURVEY.md §5.8; previously only the tests' hand-rolled
    ``make_array_from_process_local_data`` pattern could).
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def fetch_replicated(x) -> np.ndarray:
    """Host copy of a (possibly sharded, possibly cross-process) device
    array: replicate through a jit identity, then ``np.asarray`` — which is
    legal on fully-replicated arrays even when the mesh spans processes
    (every process holds addressable replicas). The inverse seam of
    :func:`put_sharded` for outputs (exact-eval logits, fold embeddings,
    export tables)."""
    if isinstance(x, np.ndarray):
        return x
    if getattr(x, "is_fully_replicated", True):
        return np.asarray(x)
    mesh = x.sharding.mesh
    rep = NamedSharding(mesh, P())
    return np.asarray(jax.jit(lambda a: a, out_shardings=rep)(x))


def degree_balanced_permutation(degrees: np.ndarray, n_shards: int) -> np.ndarray:
    """Node permutation that balances EDGES (not just nodes) across shards.

    The contiguous range partition assigns ``m`` nodes per shard regardless of
    degree; on skewed graphs one shard can own most of the edges and dominate
    the halo traffic. This pass snake-orders nodes by descending degree into
    ``n_shards`` contiguous blocks (shard 0 gets ranks 0, 2n-1, 2n, 4n-1, …),
    a classic greedy load-balance that bounds the per-shard edge imbalance by
    one max-degree row. Returns ``perm`` with ``perm[new_id] = old_id``; apply
    with :func:`reorder_store` before :func:`shard_graph`.
    """
    n = len(degrees)
    m = -(-n // n_shards)
    order = np.argsort(-degrees.astype(np.int64), kind="stable")  # desc degree
    # The range partitioner splits new ids at multiples of m, so block sizes
    # are FORCED to (m, …, m, n−q·m, 0, …) with q = n//m full shards. A naive
    # snake over n_shards deals equal counts instead, drifting nodes across
    # block boundaries when n % n_shards != 0. Capacity-aware snake: while the
    # partial shard q still has slots (first n%m rounds) snake over q+1
    # shards, then over the q full shards — every shard ends exactly at its
    # partitioner-forced capacity, so concatenated blocks line up with the
    # m-ranges bit-exactly.
    q, r0 = divmod(n, m)

    def snake(count, width, start_round):
        i = np.arange(count, dtype=np.int64)
        rnd, pos = np.divmod(i, width)
        rnd = rnd + start_round
        return np.where(rnd % 2 == 0, pos, width - 1 - pos)

    n1 = r0 * (q + 1)
    shard_of_rank = np.concatenate(
        [snake(n1, q + 1, 0), snake(n - n1, max(q, 1), r0)]
    )
    # stable bucket the ranked nodes by shard, preserving rank order
    return np.concatenate([order[shard_of_rank == s] for s in range(n_shards)])


def _row_mode(v: np.ndarray, invalid: int = -1) -> np.ndarray:
    """Per-row mode of a ROW-SORTED int matrix, ignoring ``invalid`` entries;
    ties break to the smallest value (runs are in ascending order, argmax
    takes the first max). Rows that are all-invalid return ``invalid``."""
    n, k = v.shape
    change = np.ones((n, k), dtype=bool)
    change[:, 1:] = v[:, 1:] != v[:, :-1]
    run_id = np.cumsum(change, axis=1) - 1            # (n, k) run index
    counts = np.zeros((n, k), dtype=np.int32)
    np.add.at(counts, (np.repeat(np.arange(n), k), run_id.ravel()), 1)
    run_val = np.full((n, k), invalid, dtype=v.dtype)  # value of each run
    ii, jj = np.nonzero(change)
    run_val[ii, run_id[ii, jj]] = v[ii, jj]
    counts = np.where(run_val == invalid, 0, counts)
    best = np.argmax(counts, axis=1)                  # first-max = smallest val
    pos = np.argmax(run_id == best[:, None], axis=1)  # start of the best run
    return np.where(counts[np.arange(n), best] > 0, v[np.arange(n), pos],
                    invalid)


def locality_permutation(
    adj: np.ndarray, degrees: np.ndarray, sweeps: int = 20
) -> np.ndarray:
    """Label-propagation node ordering for partition locality.

    The contiguous range partitioner assigns whatever ids happen to be
    adjacent in the numbering to the same shard; on graphs whose natural ids
    interleave communities, most edges cross shards and every crossing edge
    is halo traffic. Synchronous label propagation (each node adopts the
    most common label in its closed neighborhood; labels init to node ids,
    ties to the smallest label — fully deterministic) converges communities
    to shared labels in a few sweeps; ordering by final label lays each
    community out contiguously, so the range partition's blocks align with
    communities and the cross-shard edge fraction (:func:`edge_cut_fraction`
    — the direct proxy for remote halo queries per hop) drops.

    Pays off in ``bucketed`` halo mode (comm ∝ remote queries, so locality
    shrinks the capacity needed for zero overflow) and on real ICI for ring
    topologies; ``exact`` mode's bytes are shape-fixed either way. O(E) host
    pass per sweep at ETL time, fully vectorized. Returns ``perm`` with
    ``perm[new_id] = old_id``; compose with :func:`reorder_store` like
    :func:`degree_balanced_permutation`.
    """
    n = len(degrees)
    deg = degrees.astype(np.int64)
    labels = np.arange(n, dtype=np.int64)
    # mask padded adjacency slots (they hold the node's own id — the padding
    # idiom — and would otherwise flood the vote with "self")
    valid = np.arange(adj.shape[1])[None, :] < deg[:, None]
    for _ in range(sweeps):
        votes = np.concatenate(
            [np.where(valid, labels[adj], -1), labels[:, None]], axis=1
        )
        votes.sort(axis=1)
        new = _row_mode(votes)
        if np.array_equal(new, labels):
            break
        labels = new
    # contiguous by community; degree-descending inside each community so a
    # block boundary cutting a community strands its low-degree tail
    return np.lexsort((-deg, labels))


def edge_cut_fraction(store: GraphStore, n_shards: int) -> float:
    """Fraction of real adjacency entries whose neighbor lives on a different
    shard under the contiguous range partition — the locality metric
    :func:`locality_permutation` optimizes (remote halo queries per hop)."""
    n = store.n_nodes
    m, _ = pad_to_shards(n, n_shards)
    owner_row = (np.arange(n) // m)[:, None]
    valid = np.arange(store.max_degree)[None, :] < store.degrees[:, None]
    cut = (store.adj // m != owner_row) & valid
    return float(cut.sum()) / max(int(valid.sum()), 1)


def reorder_store(store: GraphStore, perm: np.ndarray) -> GraphStore:
    """Relabel every node ``old → new`` where ``perm[new] = old``.

    All per-node arrays are permuted and adjacency CONTENTS remapped; folds
    are relabeled. Sampling semantics are identical up to node naming — used
    to front a degree-balanced layout onto the contiguous range partitioner.
    """
    n = store.n_nodes
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)

    def remap_adj(adj):
        return inv[adj[perm]].astype(np.int32)

    return GraphStore(
        adj=remap_adj(store.adj),
        degrees=store.degrees[perm],
        train_adj=remap_adj(store.train_adj),
        train_degrees=store.train_degrees[perm],
        feats=store.feats[perm],
        targets=store.targets[perm],
        folds={k: np.sort(inv[v]).astype(np.int64) for k, v in store.folds.items()},
        task=store.task,
        n_classes=store.n_classes,
    )


def partition_arrays(
    store: GraphStore, n_shards: int, train: bool
) -> Tuple[Dict[str, np.ndarray], int]:
    """Pad per-node arrays to ``n_shards*m`` rows; returns (arrays, m)."""
    n = store.n_nodes
    m, n_pad = pad_to_shards(n, n_shards)
    pad = n_pad - n

    adj = store.train_adj if train else store.adj
    deg = store.train_degrees if train else store.degrees

    pad_adj = np.broadcast_to(
        np.arange(n, n_pad, dtype=np.int32)[:, None], (pad, store.max_degree)
    )
    arrays = {
        "adj": np.concatenate([adj, pad_adj], axis=0).astype(np.int32),
        "degrees": np.concatenate([deg, np.zeros(pad, np.int32)]),
        "feats": np.concatenate(
            [store.feats, np.zeros((pad, store.feat_dim), store.feats.dtype)]
        ),
        "targets": np.concatenate(
            [store.targets, np.zeros((pad,) + store.targets.shape[1:], store.targets.dtype)]
        ),
    }
    return arrays, m


def _put_features(feats: np.ndarray, put, putr, quantize: bool, feat_dtype):
    """Shared feature upload for the dense/CSR shard builders: dense in the
    compute dtype, or int8 + a replicated per-column scale vector. Returns
    ``(feats_dev, feat_scale)``."""
    if quantize:
        from tpu_sage.data.quantize import quantize_np

        q, scale = quantize_np(feats)
        return put(q), putr(scale.astype(feat_dtype or np.float32))
    feats_dev = put(feats.astype(feat_dtype or np.float32))
    return feats_dev, putr(np.ones((feats_dev.shape[1],), feats_dev.dtype))


def shard_graph(
    store: GraphStore, mesh: Mesh, train: bool, axis: str = "data",
    feat_dtype=None, quantize: bool = False, reuse_feats=None,
) -> Tuple[DeviceGraph, int]:
    """Upload a node-sharded DeviceGraph: every per-node array sharded on
    axis 0 over ``axis``. Returns (graph, shard_size).

    ``feat_dtype``: on-device dtype for dense feature shards (e.g. bf16 —
    halves halo-exchange bytes; default float32). ``quantize=True`` stores
    the feature shards int8 with a replicated per-column scale vector in
    ``graph.feat_scale`` — the halo exchange then ships int8 rows (4× fewer
    ICI bytes than f32, 2× than bf16) and requesters dequantize after the
    gather (dist/train.py). ``graph.feat_scale`` is ALWAYS set on the
    partitioned path (ones for dense storage, so the shard_map signatures
    stay uniform; ``x * 1.0`` is bitwise-exact in IEEE float).

    ``reuse_feats``: an already-sharded ``(feats_dev, feat_scale)`` pair to
    adopt instead of uploading — the feature partition is train-flag
    INDEPENDENT (only the adjacency differs), so the trainer's eval-graph
    build passes its training shards here and the dominant table stays
    resident once (round-5 review finding)."""
    from tpu_sage.dist.mesh import axis_size
    n_shards = axis_size(mesh, axis)
    arrays, m = partition_arrays(store, n_shards, train)
    # put_sharded keeps this path working on cross-process meshes (each
    # process contributes its addressable shards from the replicated store)
    put = lambda x: put_sharded(np.asarray(x), mesh, P(axis))
    putr = lambda x: put_sharded(np.asarray(x), mesh, P())
    if reuse_feats is not None and tuple(reuse_feats[0].shape) != arrays[
            "feats"].shape:
        reuse_feats = None  # partition shape mismatch: upload fresh
    feats_dev, feat_scale = reuse_feats or _put_features(
        arrays["feats"], put, putr, quantize, feat_dtype)
    graph = DeviceGraph(
        adj=put(arrays["adj"]),
        degrees=put(arrays["degrees"]),
        feats=feats_dev,
        targets=put(
            arrays["targets"].astype(
                np.int32 if store.task == "classification" else np.float32
            )
        ),
        feat_scale=feat_scale,
    )
    return graph, m


def partition_csr_arrays(
    store: GraphStore, n_shards: int, train: bool
) -> Tuple[Dict[str, np.ndarray], int, int]:
    """Per-shard CSR adjacency blocks, padded to uniform static shapes.

    Each shard's ``m`` padded-dense rows convert to a local CSR whose
    ``indices`` values stay GLOBAL node ids (the halo exchange routes on
    them); the flat per-shard arrays view as ``(r, window)`` 2-D blocks for
    the two-row window materialization (``halo.CSRAdjRows``), padded to the
    heaviest shard's row count so shapes are static under ``shard_map``
    (front a ``degree_balanced_permutation`` to shrink that padding on
    skewed graphs). Returns ``(arrays, m, window)``.
    """
    from tpu_sage.sample.csr import csr_from_padded, pad_indices_for_window

    arrays, m = partition_arrays(store, n_shards, train)
    adj, deg = arrays["adj"], arrays["degrees"]
    window = max(1, int(deg.max())) if len(deg) else 1
    indptrs, blocks = [], []
    for s in range(n_shards):
        ip, ind = csr_from_padded(adj[s * m:(s + 1) * m], deg[s * m:(s + 1) * m])
        blocks.append(pad_indices_for_window(ind, window).reshape(-1, window))
        indptrs.append(ip)
    r_max = max(b.shape[0] for b in blocks)
    blocks = [np.concatenate([b, np.zeros((r_max - b.shape[0], window),
                                          np.int32)]) for b in blocks]
    arrays = dict(arrays)
    del arrays["adj"]
    arrays["indptr"] = np.concatenate(indptrs).astype(np.int32)
    arrays["indices"] = np.concatenate(blocks).astype(np.int32)
    return arrays, m, window


def shard_graph_csr(
    store: GraphStore, mesh: Mesh, train: bool, axis: str = "data",
    feat_dtype=None, quantize: bool = False, reuse_feats=None,
):
    """CSR-adjacency variant of :func:`shard_graph`: uploads a
    :class:`~tpu_sage.graph.graph_data.CSRShardedGraph` (same feature /
    target / scale layout incl. the ``reuse_feats`` contract, adjacency as
    per-shard CSR blocks). Returns ``(graph, shard_size)``."""
    from tpu_sage.dist.mesh import axis_size
    from tpu_sage.graph.graph_data import CSRShardedGraph

    n_shards = axis_size(mesh, axis)
    arrays, m, window = partition_csr_arrays(store, n_shards, train)
    put = lambda x: put_sharded(np.asarray(x), mesh, P(axis))
    putr = lambda x: put_sharded(np.asarray(x), mesh, P())
    if reuse_feats is not None and tuple(reuse_feats[0].shape) != arrays[
            "feats"].shape:
        reuse_feats = None  # partition shape mismatch: upload fresh
    feats_dev, feat_scale = reuse_feats or _put_features(
        arrays["feats"], put, putr, quantize, feat_dtype)
    graph = CSRShardedGraph(
        indptr=put(arrays["indptr"]),
        indices=put(arrays["indices"]),
        degrees=put(arrays["degrees"]),
        feats=feats_dev,
        targets=put(
            arrays["targets"].astype(
                np.int32 if store.task == "classification" else np.float32
            )
        ),
        feat_scale=feat_scale,
        window=window,
    )
    return graph, m


def shard_fold(
    fold_ids: np.ndarray, n_shards: int, shard_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Group fold ids by owner shard into a dense ``(n_shards, L)`` table.

    ``L`` is the max per-shard count; shards with fewer fold nodes wrap
    around so every shape stays static. Returns ``(ids, count)`` where
    ``count[s]`` is the TRUE number of fold nodes on shard ``s`` (float32).
    The train step uses it twice: as the loss weight (normalized by psum, so
    each shard contributes proportionally to its fold share) and as the
    sampling bound (batches draw only from the first ``count[s]`` slots —
    exact uniform over the shard's real group, never the wrapped tail).
    Empty shards get count 0 (their rows point at the shard's first node and
    the weight masks them out).
    """
    owners = fold_ids // shard_size
    groups = [fold_ids[owners == s] for s in range(n_shards)]
    L = max(1, max(len(g) for g in groups))
    out = np.zeros((n_shards, L), dtype=np.int64)
    count = np.zeros(n_shards, dtype=np.float32)
    for s, g in enumerate(groups):
        if len(g) == 0:
            out[s] = s * shard_size
        else:
            reps = -(-L // len(g))
            out[s] = np.tile(g, reps)[:L]
            count[s] = len(g)
    return out, count


def shard_fold_masked(
    fold_ids: np.ndarray, n_shards: int, shard_size: int,
    pad_to_multiple: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact-count variant for evaluation: ``(ids (n_shards, L), mask)`` where
    padding rows have mask 0 (each fold node counted exactly once)."""
    owners = fold_ids // shard_size
    groups = [fold_ids[owners == s] for s in range(n_shards)]
    L = max(1, max(len(g) for g in groups))
    if pad_to_multiple > 1:
        L = -(-L // pad_to_multiple) * pad_to_multiple
    ids = np.full((n_shards, L), 0, dtype=np.int64)
    mask = np.zeros((n_shards, L), dtype=np.float32)
    for s, g in enumerate(groups):
        ids[s] = s * shard_size  # in-range placeholder
        ids[s, : len(g)] = g
        mask[s, : len(g)] = 1.0
    return ids, mask
