"""Distributed row gather (halo exchange) over a node-sharded table.

This is the GNN analog of sequence parallelism (SURVEY.md §5.7, the
centerpiece): the graph's node axis is contiguously range-partitioned across
the ``data`` mesh axis; after sampling, neighbor ids may be owned by other
shards and their rows (features, adjacency) must be fetched over ICI/DCN.

Two static-shape formulations, both bitwise-identical to a single-device
gather (tested on the 8-device CPU mesh):

- ``dist_gather``: all_gather the (cheap, int32) query ids, answer every
  shard's queries against the local rows with non-owned rows zeroed, then
  ``psum_scatter`` the partial answers back to the requesters. Exact, two
  collectives, communication ≈ n_dev·q·d — the robust default.
- ``dist_gather_bucketed``: MoE-style capacity routing with a local bypass —
  locally-owned queries are answered from the local shard (exact, free),
  REMOTE queries bucket by owner shard, ``all_to_all`` only ids to owners
  (q ints), gather locally, ``all_to_all`` the rows straight back
  (≈ n_dev·capacity·d total). With ``capacity ≥`` the max remote queries
  per destination it is exact; overflowed remote queries fall back to a
  caller-provided default row and the overflow count is returned for
  monitoring. A locality-aware partition (``partition.locality_permutation``)
  shrinks the remote fraction and with it the capacity needed.

Both run inside ``shard_map``; all shapes static; XLA overlaps the second
collective with surrounding compute where the schedule allows (the
ppermute-ring variant is the fallback if overlap fails on axon —
SURVEY.md §7.3 #4).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def shard_offset(axis_name: str, shard_size: int) -> jnp.ndarray:
    """First global node id owned by this shard."""
    return lax.axis_index(axis_name) * shard_size


class CSRAdjRows:
    """Duck-typed shard-local ``(m, window+1)`` adjacency‖degree table
    materialized on demand from CSR storage (round 4).

    Every halo formulation in this module answers queries with
    ``local_table[local_idx]`` plus ``.shape``/``.dtype``/``.ndim`` — so a
    virtual table that builds each requested row from the shard's CSR
    (``indptr (m+1,)``, ``indices (r, window)`` — the flat nnz array viewed
    as 2-D rows, tail-padded two spare rows) slots into exact / ring /
    pipelined / bucketed / hier2d unchanged. Row materialization is the
    single-device window hop (sample.csr): two fast 2-D row gathers per
    query + an in-register shift select — 2 descriptors/query instead of a
    dense ``m·max_degree`` resident table. Contents are bit-identical to
    the dense ``concat(adj, deg[:, None])`` rows in the first ``deg`` slots
    (the only slots the sampler ever selects).
    """

    def __init__(self, indptr: jnp.ndarray, indices: jnp.ndarray,
                 degrees: jnp.ndarray, window: int):
        self.indptr = indptr
        self.indices = indices
        self.degrees = degrees
        self.window = window

    @property
    def shape(self):
        return (self.degrees.shape[0], self.window + 1)

    @property
    def ndim(self):
        return 2

    @property
    def dtype(self):
        return self.indices.dtype

    def __getitem__(self, idx):
        from tpu_sage.ops import row_gather_chunked
        from tpu_sage.sample.csr import gather_window_pair
        from tpu_sage.sample.sampler import select_columns

        shape = jnp.shape(idx)
        flat = jnp.reshape(idx, (-1,)).astype(jnp.int32)
        pair, off, _ = gather_window_pair(self.indptr, self.indices, flat,
                                          self.window)
        win = select_columns(
            pair, off[:, None] + jnp.arange(self.window, dtype=jnp.int32)[None, :]
        )                                                   # (N, window)
        deg = row_gather_chunked(self.degrees, flat).astype(win.dtype)
        out = jnp.concatenate([win, deg[:, None]], axis=1)
        return out.reshape(shape + (self.window + 1,))


class CSRPairRows(CSRAdjRows):
    """The SHIPPED CSR adjacency view: raw ``lo‖hi‖off‖deg`` pair rows,
    ``(m, 2·window + 2)``.

    :class:`CSRAdjRows` aligns each row at the owner with a full
    ``window``-wide shift select — N·window·2window compare-selects per
    exchange, which measured +48% whole-step over dense-sharded at the
    headline graph (bench_logs/r4_csr_partitioned.log: 3.471 vs 2.347
    ms/step). The requester only ever reads ``fanout ≪ window`` columns, so
    shipping the two UNALIGNED covering rows plus the offset and degree and
    selecting ``off + col`` at the requester cuts the select work
    ``window/fanout``× (≈13× at (25,10)). Costs 2× the adjacency-exchange
    row width on the wire — the small exchange next to features.
    ``sample_level_distributed`` consumes the layout via ``pair_window``.
    """

    @property
    def shape(self):
        return (self.degrees.shape[0], 2 * self.window + 2)

    def __getitem__(self, idx):
        from tpu_sage.ops import row_gather_chunked
        from tpu_sage.sample.csr import gather_window_pair

        shape = jnp.shape(idx)
        flat = jnp.reshape(idx, (-1,)).astype(jnp.int32)
        pair, off, _ = gather_window_pair(self.indptr, self.indices, flat,
                                          self.window)
        deg = row_gather_chunked(self.degrees, flat)
        out = jnp.concatenate(
            [pair, off[:, None].astype(jnp.int32),
             deg[:, None].astype(jnp.int32)],
            axis=1,
        )                                                   # (N, 2w+2)
        return out.reshape(shape + (2 * self.window + 2,))


def dist_sample_csr_owner_select(
    indptr: jnp.ndarray,    # (m+1,) shard-local CSR row starts (flat offsets)
    indices: jnp.ndarray,   # (r, window) flat nnz ids viewed as 2-D rows
    degrees: jnp.ndarray,   # (m,)
    window: int,
    ids: jnp.ndarray,       # (q,) GLOBAL frontier ids queried by this shard
    u: jnp.ndarray,         # (q, fanout) the requester's uniform draws
    axis_name: str,
) -> jnp.ndarray:
    """CSR sampling hop with the fanout column-select at the OWNER (round 5).

    :class:`CSRPairRows` ships the two unaligned covering rows + offset +
    degree (``2·window + 2`` ints/query) and lets the requester select its
    ``fanout`` columns — at the headline graph that answer width costs
    +10.5% whole-step over dense shards (RESULTS r4 §6). The requester only
    ever reads ``fanout ≪ window`` values, and the owner can compute the
    SAME column draws if it has the requester's uniforms — so this ships
    ``u`` upstream (``fanout`` f32/query, riding the existing id
    all_gather) and answers with the selected values plus the degree:
    ``fanout + 1`` ints/query, ``(2w+2)/(f+1)`` ≈ 23× narrower at
    (window 128, fanout 10). Sampled values are BITWISE-identical to the
    pair-answer path: same uniforms → same ``min((u·deg).int32, deg−1)``
    columns → same ``indices[start + col]`` reads; the degree column drives
    the requester's degree-0 self-loop rule unchanged.
    """
    from tpu_sage.ops import row_gather_chunked
    from tpu_sage.sample.csr import gather_window_pair
    from tpu_sage.sample.sampler import select_columns

    m = degrees.shape[0]
    offset = shard_offset(axis_name, m)
    all_ids = lax.all_gather(ids, axis_name)            # (n_dev, q)
    all_u = lax.all_gather(u, axis_name)                # (n_dev, q, fanout)
    flat_ids = all_ids.reshape(-1)
    flat_u = all_u.reshape(-1, u.shape[-1])
    local_idx = jnp.clip(flat_ids - offset, 0, m - 1)
    r_deg = row_gather_chunked(degrees, local_idx)
    deg = jnp.maximum(r_deg, 1)
    # identical arithmetic to sample_level_distributed's requester-side path
    cols = jnp.minimum(
        (flat_u * deg[:, None].astype(flat_u.dtype)).astype(jnp.int32),
        deg[:, None] - 1,
    )
    pair, off, _ = gather_window_pair(indptr, indices, local_idx, window)
    vals = select_columns(pair, off[:, None] + cols)    # (N, fanout)
    out = jnp.concatenate([vals, r_deg[:, None].astype(vals.dtype)], axis=1)
    owned = (flat_ids >= offset) & (flat_ids < offset + m)
    out = jnp.where(owned[:, None], out, 0)
    return lax.psum_scatter(out, axis_name, scatter_dimension=0, tiled=True)


def dist_gather(
    local_table: jnp.ndarray,  # (m, d) rows owned by this shard
    ids: jnp.ndarray,          # (q,) GLOBAL ids queried by this shard
    axis_name: str,
) -> jnp.ndarray:
    """Exact distributed gather: returns ``(q, d)`` rows for global ``ids``.

    all_gather(ids) → masked local answers → psum_scatter back. Every entry
    of the result equals ``global_table[ids]`` exactly (zero rows for
    out-of-range ids, which do not occur with a correct partitioner).
    """
    m = local_table.shape[0]
    offset = shard_offset(axis_name, m)
    all_ids = lax.all_gather(ids, axis_name)            # (n_dev, q)
    local_idx = jnp.clip(all_ids - offset, 0, m - 1)
    rows = local_table[local_idx]                        # (n_dev, q, d...)
    owned = (all_ids >= offset) & (all_ids < offset + m)
    rows = jnp.where(
        owned.reshape(owned.shape + (1,) * (rows.ndim - 2)), rows, 0
    )
    flat = rows.reshape((-1,) + rows.shape[2:])          # (n_dev*q, d...)
    return lax.psum_scatter(flat, axis_name, scatter_dimension=0, tiled=True)


def dist_gather_fanout_mean(
    local_table: jnp.ndarray,  # (m, d) rows owned by this shard
    ids: jnp.ndarray,          # (q,) GLOBAL ids, q = n_roots * fanout
    fanout: int,
    axis_name: str,
) -> jnp.ndarray:
    """Fused halo gather + per-root fanout mean: returns ``(q/fanout, d)``.

    For the DEEPEST tree level under the mean aggregator the gathered rows'
    sole consumer is ``mean`` over each root's ``fanout`` group — and that
    mean commutes with the disjoint-ownership cross-shard sum, so each shard
    pre-reduces its masked answers and ``psum_scatter`` ships the per-root
    means instead of the raw rows: ``fanout×`` less collective payload on
    the partitioned step's dominant exchange (bytes: rows·width·dtype →
    rows/fanout·width·f32). Equals
    ``mean(dist_gather(...).astype(f32).reshape(-1, fanout, d), axis=1)``
    up to float summation order. Always returns float32 (integer tables —
    int8 feature shards — cannot carry a mean); the caller's dequant scale
    commutes with the mean, so ``dq(fused) == mean(dq(rows))``.
    """
    m = local_table.shape[0]
    offset = shard_offset(axis_name, m)
    all_ids = lax.all_gather(ids, axis_name)            # (n_dev, q)
    local_idx = jnp.clip(all_ids - offset, 0, m - 1)
    rows = local_table[local_idx]                        # (n_dev, q, d)
    owned = (all_ids >= offset) & (all_ids < offset + m)
    rows = jnp.where(
        owned.reshape(owned.shape + (1,) * (rows.ndim - 2)), rows, 0
    ).astype(jnp.float32)
    nd, q = all_ids.shape
    red = jnp.mean(rows.reshape((nd, q // fanout, fanout) + rows.shape[2:]), axis=2)
    flat = red.reshape((-1,) + red.shape[2:])            # (n_dev*q/f, d)
    return lax.psum_scatter(flat, axis_name, scatter_dimension=0, tiled=True)


def dist_gather_ring_fanout_mean(
    local_table: jnp.ndarray,
    ids: jnp.ndarray,
    fanout: int,
    axis_name: str,
    n_shards: int,
) -> jnp.ndarray:
    """Ring-rotation counterpart of :func:`dist_gather_fanout_mean`.

    The id buffer rotates full (ints are cheap); the ANSWER buffer rotates
    pre-reduced — ``(q/fanout, d)`` float32 accumulating each shard's mean
    contribution (ownership is disjoint, so where-fill becomes add) —
    ``fanout×`` less ppermute traffic than :func:`dist_gather_ring`.

    The single-level specialization of
    :func:`dist_gather_ring_pipelined` (round-5 review: the rotate/contrib
    chain was maintained in three copies; one implementation now).
    """
    return dist_gather_ring_pipelined(
        local_table, [ids], axis_name, n_shards, last_fanout=fanout
    )[0]


def dist_gather_ring(
    local_table: jnp.ndarray,  # (m, d) rows owned by this shard
    ids: jnp.ndarray,          # (q,) GLOBAL ids queried by this shard
    axis_name: str,
    n_shards: int,
) -> jnp.ndarray:
    """Ring-rotation distributed gather (the ring-attention analog —
    SURVEY.md §5.7 "ppermute-ring variant").

    The (query ids ‖ answer buffer) pair rotates around the ring; each shard
    fills the rows it owns as the buffer passes through. n hops of
    ``ppermute`` move the same total bytes as the exact mode, but as a chain
    of neighbor exchanges that XLA can pipeline with the per-hop fill compute
    — the preferred shape when all_to_all/psum_scatter schedules poorly.
    Exact: every entry equals ``global_table[ids]``.

    The single-level specialization of
    :func:`dist_gather_ring_pipelined` (round-5 review: one rotate/fill
    implementation instead of three lockstep copies).
    """
    return dist_gather_ring_pipelined(
        local_table, [ids], axis_name, n_shards
    )[0]


def dist_gather_2d(
    local_table: jnp.ndarray,  # (m, d) rows owned by this (host, chip) shard
    ids: jnp.ndarray,          # (q,) GLOBAL ids queried by this shard
    host_axis: str,
    chip_axis: str,
    fanout: Optional[int] = None,
) -> jnp.ndarray:
    """Hierarchical exact gather over a 2-D ``(host, chip)`` mesh: the row
    traffic is reduced WITHIN each host (ICI-analog axis) before anything
    crosses hosts (DCN-analog axis) — SURVEY.md §5.7 "ICI (intra-slice) /
    DCN (cross-slice)".

    Global shard index is ``host·n_chips + chip`` (the order a combined
    ``P((host, chip))`` sharding lays rows out in), each owning ``m`` rows.
    Three phases:

    1. ids replicate: ``all_gather`` over hosts (cheap ints on DCN), then
       over chips (ICI) → every chip sees all ``(C, H, q)`` queries.
    2. ICI reduce: local masked answers ``psum_scatter`` over the chip axis —
       chip ``c`` receives, for every host-peer ``(h', c)``'s queries, the
       answers COMPLETE WITHIN THIS HOST.
    3. DCN reduce: ``psum_scatter`` over the host axis combines the per-host-
       complete partials and delivers each chip its own queries' rows.

    Comm accounting per chip (rows of width d): ICI ≈ C·H·q·d (the chip-axis
    scatter), DCN = H·q·d — the flat 1-D exact exchange moves its whole
    n·q·d = C·H·q·d row volume over a group that SPANS hosts, so the
    hierarchical form cuts cross-host row bytes by ~C×. With ``fanout`` set
    the answers pre-reduce to per-root means BEFORE both scatters
    (``dist_gather_fanout_mean``'s contract: float32, another fanout× off
    both links).

    Exactness: equals ``dist_gather`` over the flattened ``(host, chip)``
    axis pair bitwise (modulo the f32 promote when ``fanout`` is set);
    tested on the (2, 4) CPU mesh.
    """
    m = local_table.shape[0]
    my = lax.axis_index((host_axis, chip_axis))  # linear host*C + chip
    offset = my * m
    ids_h = lax.all_gather(ids, host_axis)       # (H, q) — DCN, int32
    all_ids = lax.all_gather(ids_h, chip_axis)   # (C, H, q) — ICI, int32
    local_idx = jnp.clip(all_ids - offset, 0, m - 1)
    rows = local_table[local_idx]                # (C, H, q, d...)
    owned = (all_ids >= offset) & (all_ids < offset + m)
    rows = jnp.where(
        owned.reshape(owned.shape + (1,) * (rows.ndim - 3)), rows, 0
    )
    if fanout is not None:
        c, h, q = all_ids.shape
        rows = jnp.mean(
            rows.astype(jnp.float32).reshape(
                (c, h, q // fanout, fanout) + rows.shape[3:]
            ),
            axis=3,
        )
    # phase 2: within-host reduction, delivered to the requesting chip column
    # (flatten (C, H, q') into the scatter dimension: tiles are (H·q', d))
    part = lax.psum_scatter(
        rows.reshape((-1,) + rows.shape[3:]), chip_axis,
        scatter_dimension=0, tiled=True,
    )                                            # (H·q', d...)
    # phase 3: cross-host reduction, delivered to the requesting host
    return lax.psum_scatter(
        part, host_axis, scatter_dimension=0, tiled=True
    )                                            # (q', d...)


def dist_gather_ring_pipelined(
    local_table: jnp.ndarray,       # (m, d) rows owned by this shard
    ids_list,                       # [(q_l,) GLOBAL ids] one entry per level
    axis_name: str,
    n_shards: int,
    last_fanout: Optional[int] = None,
):
    """Hop-major interleaved ring exchange for several query sets against the
    SAME sharded table — the explicit halo/compute overlap pipeline
    (SURVEY.md §5.7 "Overlap: double-buffer").

    ``dist_gather_ring`` serializes one complete n-hop chain per level: level
    l+1's first ppermute cannot be issued until level l's last fill returns.
    Here the chains interleave HOP-MAJOR: each ring step first issues EVERY
    level's (ids ‖ answers) rotation back to back, then runs every level's
    fill — buffer l's ppermute has no data dependence on buffer l±1's fill,
    so the scheduler can run one level's ICI rotation under another level's
    fill compute instead of idling the link between chains.

    With ``last_fanout`` set, the LAST level's answers rotate PRE-REDUCED to
    per-root fanout means (``dist_gather_ring_fanout_mean``'s contract:
    float32, ``fanout×`` less traffic); the caller must pass
    ``last_reduced_fanout`` downstream exactly as for ``make_gather_last``.

    Returns a list of per-level answers, element-identical to calling the
    per-level ring functions (tested bitwise on the 8-device CPU mesh).
    """
    m = local_table.shape[0]
    my = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    n_levels = len(ids_list)

    def owned_rows(buf_ids):
        offset = my * m
        local_idx = jnp.clip(buf_ids - offset, 0, m - 1)
        rows = local_table[local_idx]
        owned = (buf_ids >= offset) & (buf_ids < offset + m)
        return rows, owned

    def fill(buf_ids, buf_ans):
        rows, owned = owned_rows(buf_ids)
        return jnp.where(
            owned.reshape(owned.shape + (1,) * (rows.ndim - 1)), rows, buf_ans
        )

    def contrib(buf_ids):
        qf = buf_ids.shape[0] // last_fanout
        rows, owned = owned_rows(buf_ids)
        rows = jnp.where(
            owned.reshape(owned.shape + (1,) * (rows.ndim - 1)), rows, 0
        ).astype(jnp.float32)
        return jnp.mean(rows.reshape((qf, last_fanout) + rows.shape[1:]), axis=1)

    def reduced(l):
        return last_fanout is not None and l == n_levels - 1

    # home fill, then n-1 interleaved rotate-all / fill-all hops
    bufs = []
    for l, ids in enumerate(ids_list):
        if reduced(l):
            bufs.append([ids, contrib(ids)])
        else:
            ans = jnp.zeros(ids.shape + local_table.shape[1:], local_table.dtype)
            bufs.append([ids, fill(ids, ans)])
    for _ in range(n_shards - 1):
        for b in bufs:  # all rotations issued before any fill consumes them
            b[0] = lax.ppermute(b[0], axis_name, perm)
            b[1] = lax.ppermute(b[1], axis_name, perm)
        for l, b in enumerate(bufs):
            b[1] = (b[1] + contrib(b[0])) if reduced(l) else fill(b[0], b[1])
    # one final hop brings every buffer back to its origin shard
    return [lax.ppermute(b[1], axis_name, perm) for b in bufs]


def dist_gather_bucketed(
    local_table: jnp.ndarray,   # (m, d)
    ids: jnp.ndarray,           # (q,) global ids
    axis_name: str,
    n_shards: int,
    capacity: int,
    fallback_row: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Capacity-routed distributed gather with a local bypass.

    Locally-owned queries are answered straight from ``local_table`` —
    exact, zero communication, no capacity charge. Only REMOTE queries route
    through the all_to_all buckets, so ``capacity`` bounds remote queries
    per destination. This matters structurally: batch roots always live on
    their own shard (the fold is node-sharded), so without the bypass the
    self-bucket needs ``capacity ≈ q`` while remote buckets need ``q/n``,
    and root feature rows overflow catastrophically. With a locality-aware
    partition (``dist.partition.locality_permutation``) most neighbor
    queries are local too, shrinking the capacity needed for zero overflow
    to the cross-shard edge fraction.

    Returns ``(rows (q, d), n_overflowed (1,))``. Remote queries beyond
    ``capacity`` per destination shard receive ``fallback_row`` (zeros if
    None).
    """
    m = local_table.shape[0]
    q = ids.shape[0]
    offset = shard_offset(axis_name, m)
    owner = jnp.clip(ids // m, 0, n_shards - 1)          # (q,)
    my = lax.axis_index(axis_name)
    is_local = owner == my

    # local bypass: answer owned queries from the local shard directly
    local_rows = local_table[jnp.clip(ids - offset, 0, m - 1)]

    # position of each REMOTE query within its owner's bucket (stable order);
    # local queries are excluded from the buckets entirely
    onehot = jnp.where(
        is_local[:, None], 0, jax.nn.one_hot(owner, n_shards, dtype=jnp.int32)
    )                                                     # (q, n_shards)
    pos = (jnp.cumsum(onehot, axis=0) - onehot)[jnp.arange(q), owner]  # (q,)
    overflowed = (pos >= capacity) & ~is_local
    n_overflow = overflowed.sum().reshape(1)  # rank-1 so shard_map can stack it

    # scatter remote ids into the (n_shards, capacity) send buffer; -1 marks
    # empty. local queries are forced out of bounds and dropped by the
    # scatter, as are overflowed remote queries.
    send = jnp.full((n_shards, capacity), -1, dtype=ids.dtype)
    pos_send = jnp.where(is_local, capacity, pos)
    send = send.at[owner, pos_send].set(ids, mode="drop")

    # route queries to owners: all_to_all over the shard axis
    recv = lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0, tiled=True)
    recv = recv.reshape(n_shards, capacity)              # queries I must answer

    valid = recv >= 0
    local_idx = jnp.clip(recv - offset, 0, m - 1)
    answers = local_table[local_idx]                     # (n_shards, capacity, d)
    answers = jnp.where(
        valid.reshape(valid.shape + (1,) * (answers.ndim - 2)), answers, 0
    )

    # route answers back: same all_to_all pattern in reverse
    back = lax.all_to_all(
        answers.reshape((n_shards * capacity,) + answers.shape[2:]),
        axis_name, split_axis=0, concat_axis=0, tiled=True,
    ).reshape((n_shards, capacity) + answers.shape[2:])

    # un-scatter into query order (clamped read; overflow masked below)
    read_pos = jnp.minimum(pos, capacity - 1)
    gathered = back[owner, read_pos]                     # (q, d)
    if fallback_row is None:
        fallback_row = jnp.zeros(gathered.shape[1:], dtype=gathered.dtype)
    gathered = jnp.where(
        overflowed.reshape((-1,) + (1,) * (gathered.ndim - 1)),
        fallback_row, gathered,
    )
    gathered = jnp.where(
        is_local.reshape((-1,) + (1,) * (gathered.ndim - 1)),
        local_rows, gathered,
    )
    return gathered, n_overflow
