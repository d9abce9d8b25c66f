"""Device-resident graph storage: padded fixed-max-degree neighbor tables.

The reference (``bkj/pytorch-graphsage``, ``problem.py`` / ``convert.py`` —
SURVEY.md §2.1) stores the graph as a dense ``(n_nodes, max_degree)`` LongTensor
of neighbor ids, padded/truncated at ETL time, because that makes every
minibatch tensor statically shaped. That decision is *exactly* what a TPU
wants: we keep it, but the table lives in HBM as a ``jnp.int32`` array and all
sampling happens on device.

Padding idiom (ours, documented — reference idiom is a SURVEY §8 verify item):
rows with ``degree < max_degree`` are padded with the node's own id (self-loop),
and ``degree == 0`` rows are all-self. The sampler only ever draws column
indices in ``[0, max(degree, 1))``, so padding values are never selected except
for isolated nodes, which self-loop (matching the upstream GraphSAGE behavior
of never producing out-of-graph ids).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DeviceGraph:
    """The on-device graph: everything the jit'd train step touches.

    All fields are ``jnp`` arrays with static shapes; this is a pytree and can
    be donated / sharded. ``adj``/``degrees`` describe the sampling graph
    (train-edges-only during training, full graph at eval — the reference's
    ``train_adj`` vs ``adj`` inductive split, SURVEY.md §2.1 "Problem
    container").
    """

    adj: jnp.ndarray       # (n_nodes, max_degree) int32, padded with self id
    degrees: jnp.ndarray   # (n_nodes,) int32 true degree (0 allowed)
    feats: jnp.ndarray     # (n_nodes, feat_dim) float — or QuantizedFeats,
    # or (partitioned int8 path) a raw int8 array with feat_scale set
    targets: jnp.ndarray   # (n_nodes,) int32 or (n_nodes, n_targets) float
    feat_scale: Optional[jnp.ndarray] = None  # (feat_dim,) per-column dequant
    # scales — ALWAYS set by dist.partition.shard_graph (real scales for int8
    # shards, ones for dense, so the shard_map step signatures stay uniform);
    # None on the single-device path (which duck-types via QuantizedFeats)

    @property
    def n_nodes(self) -> int:
        return self.adj.shape[0]

    @property
    def max_degree(self) -> int:
        return self.adj.shape[1]

    @property
    def feat_dim(self) -> int:
        return self.feats.shape[1]


@struct.dataclass
class CSRDeviceGraph:
    """CSR variant of :class:`DeviceGraph` — the memory-lean storage.

    ``nnz`` neighbor ids instead of ``n·max_degree``; sampling runs through
    ``tpu_sage.sample.csr`` (window hop by default since round 4 — 93% of
    the dense path's throughput, see the module docstring tradeoff).
    Duck-compatible with ``DeviceGraph`` for every non-adjacency field, so
    the trainer dispatches purely on the presence of ``indptr``.
    """

    indptr: jnp.ndarray    # (n_nodes+1,) int32
    indices: jnp.ndarray   # (nnz [+ window pad],) int32
    degrees: jnp.ndarray   # (n_nodes,) int32
    feats: jnp.ndarray     # (n_nodes, feat_dim) float
    targets: jnp.ndarray   # (n_nodes,) int32 or (n_nodes, n_targets) float
    window: int = struct.field(pytree_node=False, default=0)
    # static window width for the round-4 window-gather hop (one descriptor
    # per frontier node instead of per sampled element — sample/csr.py);
    # must be ≥ the graph's true max degree and ``indices`` must carry
    # ``window`` padding entries at the tail (to_device_csr does both).
    # 0 = the element-gather formulation (kept for A/B)

    @property
    def n_nodes(self) -> int:
        return self.degrees.shape[0]

    @property
    def feat_dim(self) -> int:
        return self.feats.shape[1]


@struct.dataclass
class CSRShardedGraph:
    """Node-sharded graph with CSR adjacency storage (round 4).

    The partitioned-path sibling of :class:`CSRDeviceGraph`: per-node arrays
    are sharded over the mesh axis exactly like :class:`DeviceGraph` from
    ``dist.partition.shard_graph``, but each shard's adjacency lives as its
    own CSR block — ``indptr`` is the per-shard row starts concatenated
    (``n_shards·(m+1)`` entries, each shard's block indexing its own
    ``indices`` rows) and ``indices`` is the per-shard 2-D window view
    (``n_shards·r`` rows of ``window``), padded to the largest shard. The
    halo exchange materializes adjacency rows on demand through
    ``dist.halo.CSRAdjRows`` — same collectives, same bytes on the wire,
    ``nnz``-shaped HBM instead of ``m·max_degree`` per shard.
    """

    indptr: jnp.ndarray    # (n_shards*(m+1),) int32 — per-shard local starts
    indices: jnp.ndarray   # (n_shards*r, window) int32 — per-shard blocks
    degrees: jnp.ndarray   # (n_shards*m,) int32
    feats: jnp.ndarray     # (n_shards*m, feat_dim)
    targets: jnp.ndarray
    feat_scale: Optional[jnp.ndarray] = None
    window: int = struct.field(pytree_node=False, default=0)

    @property
    def n_nodes(self) -> int:
        return self.degrees.shape[0]

    @property
    def feat_dim(self) -> int:
        return self.feats.shape[1]


def build_padded_adjacency(
    edges: np.ndarray,
    n_nodes: int,
    max_degree: int,
    rng: Optional[np.random.Generator] = None,
    symmetrize: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Edge list ``(E, 2)`` → padded neighbor table ``(n_nodes, max_degree)``.

    High-degree rows are truncated by uniform random subsampling (without
    replacement); low-degree rows are padded with the row's own node id.
    Returns ``(adj int32, degrees int32)`` with ``degrees`` clipped to
    ``max_degree`` (the capacity actually available to the sampler).

    Mirrors the reference's ETL (``convert.py``, SURVEY.md §3.4) but
    vectorized: CSR bucketing via ``np.argsort`` instead of per-node python
    loops, so Reddit-scale graphs (~60M directed edges) build in seconds.
    """
    if rng is None:
        rng = np.random.default_rng(0)
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    if symmetrize and len(edges):
        edges = np.concatenate([edges, edges[:, ::-1]], axis=0)

    adj = np.broadcast_to(
        np.arange(n_nodes, dtype=np.int32)[:, None], (n_nodes, max_degree)
    ).copy()
    degrees = np.zeros(n_nodes, dtype=np.int32)
    if len(edges) == 0:
        return adj, degrees

    # Drop duplicate directed edges, then bucket by source via sort.
    edges = np.unique(edges, axis=0)
    src, dst = edges[:, 0], edges[:, 1]
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=n_nodes)
    row_starts = np.concatenate([[0], np.cumsum(counts)])

    # Position of each edge within its source's bucket: 0..deg-1.
    pos = np.arange(len(src)) - row_starts[src]

    over = counts > max_degree
    if over.any():
        # Random subsample per overfull row: shuffle within-bucket positions by
        # ranking random keys per bucket, then keep pos < max_degree.
        keys = rng.random(len(src))
        # rank of each edge inside its bucket under random keys
        order2 = np.lexsort((keys, src))
        pos = np.empty(len(src), dtype=np.int64)
        pos[order2] = np.arange(len(src)) - row_starts[src[order2]]
    keep = pos < max_degree
    adj[src[keep], pos[keep]] = dst[keep].astype(np.int32)
    degrees = np.minimum(counts, max_degree).astype(np.int32)
    return adj, degrees


@dataclasses.dataclass
class GraphStore:
    """Host-side graph container (numpy) with the full/train adjacency split.

    The reference's ``NodeProblem`` holds ``adj`` (full graph, used at
    validation) and ``train_adj`` (train-edges-only, used during training to
    enforce inductiveness — SURVEY.md §2.1). ``to_device(train=...)`` picks the
    right table and uploads once.
    """

    adj: np.ndarray          # (n, max_degree) int32  — full graph
    degrees: np.ndarray      # (n,) int32
    train_adj: np.ndarray    # (n, max_degree) int32  — train-only edges
    train_degrees: np.ndarray
    feats: np.ndarray        # (n, d) float32
    targets: np.ndarray      # (n,) int64 or (n, c) float32
    folds: Dict[str, np.ndarray]  # mode -> node ids (int64)
    task: str = "classification"
    n_classes: int = 0

    @property
    def n_nodes(self) -> int:
        return self.adj.shape[0]

    @property
    def max_degree(self) -> int:
        return self.adj.shape[1]

    @property
    def feat_dim(self) -> int:
        return self.feats.shape[1]

    def to_device(
        self, train: bool, dtype=jnp.float32, quantize: bool = False
    ) -> DeviceGraph:
        adj = self.train_adj if train else self.adj
        deg = self.train_degrees if train else self.degrees
        if self.task == "classification":
            targets = jnp.asarray(self.targets, dtype=jnp.int32)
        else:
            targets = jnp.asarray(self.targets, dtype=dtype)
        return DeviceGraph(
            adj=jnp.asarray(adj, dtype=jnp.int32),
            degrees=jnp.asarray(deg, dtype=jnp.int32),
            feats=self._device_feats(dtype, quantize),
            targets=targets,
        )

    def _device_feats(self, dtype, quantize: bool):
        """Dense upload, or int8 + per-column scales (``--feature-int8``).

        Cached per ``(dtype, quantize)``: the train-edge and full-edge
        DeviceGraphs differ only in ADJACENCY, and ``fit()`` holds both —
        without this cache the dominant feature table was uploaded and
        resident TWICE (round-5 review finding; the capacity model counts
        it once, and jax arrays are immutable so sharing is safe)."""
        cache = self.__dict__.setdefault("_device_feats_cache", {})
        key = (jnp.dtype(dtype).name, quantize)
        if key not in cache:
            if not quantize:
                cache[key] = jnp.asarray(self.feats, dtype=dtype)
            else:
                from tpu_sage.data.quantize import quantize_feats

                cache[key] = quantize_feats(
                    self.feats, out_dtype=jnp.dtype(dtype).name)
        return cache[key]

    def to_device_csr(
        self, train: bool, dtype=jnp.float32, quantize: bool = False
    ) -> CSRDeviceGraph:
        """CSR upload: ``nnz`` ids in HBM instead of ``n·max_degree``."""
        from tpu_sage.sample.csr import csr_from_padded

        from tpu_sage.sample.csr import pad_indices_for_window

        adj = self.train_adj if train else self.adj
        deg = self.train_degrees if train else self.degrees
        indptr, indices = csr_from_padded(adj, deg)
        # window-gather hop (sample/csr.py): the flat indices view as a 2-D
        # (m, window) table with window ≥ the true max degree
        window = max(1, int(deg.max())) if len(deg) else 1
        indices = pad_indices_for_window(indices, window)
        if self.task == "classification":
            targets = jnp.asarray(self.targets, dtype=jnp.int32)
        else:
            targets = jnp.asarray(self.targets, dtype=dtype)
        return CSRDeviceGraph(
            indptr=jnp.asarray(indptr, dtype=jnp.int32),
            indices=jnp.asarray(indices, dtype=jnp.int32),
            degrees=jnp.asarray(deg, dtype=jnp.int32),
            feats=self._device_feats(dtype, quantize),
            targets=targets,
            window=window,
        )
