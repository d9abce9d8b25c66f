"""Node-sharded (edge-partitioned) training: shard_map + halo exchange.

The multi-chip training path (SURVEY.md §5.7 — the ring-attention analog for
graphs). Each shard of the ``data`` mesh axis owns a contiguous node range
(adjacency rows, degrees, features, targets) plus the slice of every batch
drawn from its range. One train step, per shard:

1. draw ``batch_per_shard`` root ids from the shard's local fold table by
   per-epoch permutation cycling (same distribution family as the
   single-device epoch shuffle: within an epoch each shard walks a fresh
   random permutation of its own fold group without replacement, wrapping
   only if the epoch asks for more draws than the shard owns);
2. level by level, ``dist_gather`` the (adjacency row ‖ degree) of the
   frontier — rows of remote nodes arrive over ICI — and sample ``fanout``
   columns on device;
3. ``dist_gather`` feature rows for every tree level (the halo exchange);
4. run the dense network on local tensors, weighted-``psum`` the loss/grads,
   and apply identical optimizer updates on every shard (params replicated).

Everything static-shape; XLA schedules the collectives and can overlap the
level-``k+1`` gather with level-``k`` compute (double-buffering per
SURVEY.md §5.7 "Overlap").

Model params are replicated; supports all aggregators and preps (the
node-embedding table rides replicated — acceptable at GraphSAGE scales).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_sage import overrides
from tpu_sage.dist.halo import (dist_gather, dist_gather_2d,
                                dist_gather_bucketed,
                                dist_gather_fanout_mean, dist_gather_ring,
                                dist_gather_ring_fanout_mean,
                                dist_gather_ring_pipelined)
from tpu_sage.dist.mesh import axis_size
from tpu_sage.dist.partition import shard_fold, shard_graph
from tpu_sage.graph.graph_data import DeviceGraph, GraphStore
from tpu_sage.nn.model import GSSupervised
from tpu_sage.train.losses import loss_lookup
from tpu_sage.train.trainer import TrainConfig, TrainState, build_model, build_optimizer


HALO_MODES = ("auto", "measured", "exact", "ring", "pipelined", "bucketed",
              "hier2d")


def resolve_halo_mode(mode: str, n_shards: int) -> str:
    """Resolve the config's halo mode to a concrete implementation.

    ``auto`` (the default) resolves to ``exact`` everywhere as of round 3:
    three independent 8-shard CPU-mesh runs measured exact fastest (quiet
    host: exact 45.7 < pipelined 56.6 < bucketed 69.8 < ring 77.3 ms/step,
    SCALING_r03.json), reversing round 2's ring win (SCALING_r02.json —
    the ordering is environment-sensitive, which is exactly why
    ``halo='measured'`` exists: it times the candidates on the LIVE mesh at
    trainer build and picks the winner — see :func:`measure_halo_mode`).
    Among the overlap formulations the hop-major ``pipelined`` ring beats
    the per-level ``ring`` by ~27% and is the preferred ring-style choice on
    topologies where all_gather schedules poorly. Explicit modes pass
    through for A/B.
    """
    if mode not in HALO_MODES:
        raise ValueError(
            f"unknown halo mode {mode!r}; valid choices: {', '.join(HALO_MODES)}"
        )
    if mode == "measured":
        # needs the sharded graph to time real epochs — resolved by
        # from_store/fit_partitioned BEFORE the trainer is constructed
        raise ValueError(
            "halo='measured' is resolved by PartitionedTrainer.from_store / "
            "fit_partitioned (timing the candidates needs the sharded "
            "graph); build through from_store, or pass a concrete mode"
        )
    if mode == "auto":
        return "exact"
    return mode


def halo_candidates(axis, n_shards: int):
    """The modes a ``halo='measured'`` resolution races on the live mesh.

    Excludes ``bucketed`` deliberately: capacity overflow changes SEMANTICS
    (overflowed queries silently receive fallback rows), and an auto-picker
    must never trade quality for speed — pass ``--halo bucketed`` explicitly
    to opt into capacity routing. On 2-D ``(host, chip)`` meshes the flat
    ppermute-chain formulations don't apply (a ring is defined on one axis),
    so the race is exact vs hier2d. At 1 shard every collective is
    degenerate and exact has won every measurement (SCALING_r02/r03) — no
    race needed.
    """
    if n_shards == 1:
        return ["exact"]
    if isinstance(axis, tuple):
        return ["exact", "hier2d"]
    return ["exact", "ring", "pipelined"]


def resolve_measure_steps(n_steps) -> int:
    """``halo_measure_steps=None`` → backend-resolved racing-epoch length.

    The axon TPU backend charges a FLAT ~26 ms per dispatched scan program
    (RESULTS r2b cost model: an empty 50-iteration scan and a 500-iteration
    one both take ~26 ms), so a 20-step racing epoch inflates every
    candidate by ~1.3 ms/step — equal-offset, but it compresses relative
    gaps (a true 2.3 vs 2.7 ms/step contest reads 3.6 vs 4.0). 100 steps
    cuts the tax to ~0.26 ms/step; CPU has no dispatch tax and keeps the
    cheap 20 (the mesh tests race real epochs there)."""
    if n_steps is not None:
        return int(n_steps)
    return 20 if jax.default_backend() == "cpu" else 100


def measure_halo_mode(make_trainer, feat_dim: int, run_epoch, candidates,
                      n_steps=None, repeats: int = 2):
    """Race the candidate halo modes with their REAL scanned-epoch programs
    and return ``(winner, {mode: ms_per_step})``.

    The CPU-mesh mode ordering reversed between rounds on the same machine
    (ring won round 2, exact round 3 — SCALING_r02 vs r03), so a baked-in
    choice is wrong somewhere; this runs each candidate's actual
    ``train_epoch`` (same graph, same batch schedule) for ``n_steps`` steps
    (None = backend default, :func:`resolve_measure_steps`), ``repeats``
    timed runs after a compile+warm-up run, and keeps the best (min is the
    right statistic for short racing runs — noise is strictly additive).
    Costs one extra compile per candidate; opt-in via ``halo='measured'``.
    The throwaway measurement states are freshly initialized per candidate
    and never leak into training, so resume/replay determinism is untouched.

    **Sub-noise fallback:** two timed repeats of a short epoch decide the
    winner, so a margin smaller than the observed repeat-to-repeat spread is
    a coin flip, not a measurement. When ``second_best − best`` is within
    the summed spreads of those two modes, the race ABSTAINS and returns
    the ``halo='auto'`` resolution (exact — the round-3/4 measured default).
    Returns ``(winner, {mode: ms_per_step}, fallback_reason_or_None)`` —
    timings stay purely numeric; the abstention reason travels separately.

    ``make_trainer(mode)`` builds a trainer pinned to ``mode``;
    ``run_epoch(trainer, state, n_steps)`` must return ``(state, metrics)``
    with a ``metrics['loss']`` to block on.
    """
    import time as _time

    n_steps = resolve_measure_steps(n_steps)
    if len(candidates) == 1:
        return candidates[0], {}, None
    timings = {}
    spreads = {}
    for mode in candidates:
        tr = make_trainer(mode)
        state = tr.init_state(feat_dim=feat_dim)
        state, m = run_epoch(tr, state, n_steps)  # compile + warm
        jax.block_until_ready(m["loss"])
        reps = []
        for _ in range(repeats):
            t0 = _time.perf_counter()
            state, m = run_epoch(tr, state, n_steps)
            jax.block_until_ready(m["loss"])
            reps.append(1e3 * (_time.perf_counter() - t0) / n_steps)
        timings[mode] = round(min(reps), 4)
        spreads[mode] = round(max(reps) - min(reps), 4)
    ranked = sorted(timings, key=timings.get)
    winner = ranked[0]
    margin = timings[ranked[1]] - timings[ranked[0]]
    noise = spreads[ranked[0]] + spreads[ranked[1]]
    fallback = None
    if margin <= noise and "exact" in candidates:
        # A sub-noise margin between the top two is a coin flip — but falling
        # back to the auto default is only sound when "exact" is itself
        # inside the noise of the best. If exact measured decisively slower
        # (e.g. ring 2.0 / pipelined 2.05 / exact 10.0), abstaining to it
        # would pin the whole run to a mode the race just rejected; keep the
        # measured best instead (either near-tied contender is fine).
        exact_gap = timings["exact"] - timings[ranked[0]]
        exact_noise = spreads["exact"] + spreads[ranked[0]]
        if exact_gap <= exact_noise:
            # keep timings purely {mode: ms/step}; the reason travels
            # separately
            fallback = (
                f"margin {round(margin, 4)} ms/step within repeat noise "
                f"{round(noise, 4)} — using the auto default"
            )
            winner = "exact"
        else:
            fallback = (
                f"margin {round(margin, 4)} ms/step within repeat noise "
                f"{round(noise, 4)}; exact is {round(exact_gap, 4)} ms/step "
                f"slower than the best (beyond its noise "
                f"{round(exact_noise, 4)}) — keeping the measured best"
            )
    if jax.process_count() > 1:
        # The racing epochs are collective (the mesh spans processes) so the
        # wall-clocks agree closely — but not bitwise, and a near-tie could
        # resolve differently per process. Divergent winners mean divergent
        # collective programs → a deadlock. Process 0's choice is law.
        from jax.experimental import multihost_utils

        order = sorted(candidates)
        idx = np.asarray(order.index(winner), dtype=np.int32)
        winner = order[int(multihost_utils.broadcast_one_to_all(idx))]
    return winner, timings, fallback


def _no_overflow() -> jnp.ndarray:
    return jnp.zeros((), jnp.int32)


def resolve_mesh_axis(config, mesh: Optional[Mesh]):
    """Mesh + shard-axis selection shared by the partitioned fit loops.

    ``halo='hier2d'`` with no explicit mesh auto-builds the hierarchical
    topology — one ``host`` row per process, local chips along ``chip`` (the
    OGBN-products multi-host layout); an explicit 2-axis mesh implies
    tuple-axis sharding; otherwise one flat ``data`` axis over all devices.
    """
    axis = "data"
    if mesh is None:
        from tpu_sage.dist.mesh import make_mesh

        if getattr(config, "halo", "auto") == "hier2d":
            n_hosts = jax.process_count()
            n_chips = len(jax.devices()) // n_hosts
            mesh = make_mesh(axis_names=("host", "chip"),
                             shape=(n_hosts, n_chips))
            axis = ("host", "chip")
        else:
            mesh = make_mesh()
    elif len(mesh.axis_names) == 2:
        axis = tuple(mesh.axis_names)
    return mesh, axis





def adj_pack_of(graph):
    """The per-shard adjacency arrays as a pack the shard_map steps thread
    through one argument: dense ``(adj, degrees)`` or CSR
    ``(indptr, indices, degrees)`` (round 4 — CSRShardedGraph)."""
    if hasattr(graph, "indptr"):
        return (graph.indptr, graph.indices, graph.degrees)
    return (graph.adj, graph.degrees)


def build_adj_view(adj_pack, window: int):
    """``(adjacency table view, degrees)`` from the packed shard-local
    arrays. ``window`` > 0 selects the CSR virtual PAIR table
    (``halo.CSRPairRows`` — unaligned ``lo‖hi‖off‖deg`` rows, the requester
    selects ``off + col``); 0 the dense ``adj‖deg`` table. Sampled VALUES
    are identical between the storages (same uniforms → same columns → same
    ``indices[start + col]`` reads), so the halo formulations and sampling
    math stay shared bit-for-bit; callers pass ``pair_window=window`` to
    ``sample_level_distributed`` so it decodes the layout."""
    if window > 0:
        indptr, indices, deg = adj_pack
        from tpu_sage.dist.halo import CSRPairRows

        return CSRPairRows(indptr, indices, deg, window), deg
    adj, deg = adj_pack
    return jnp.concatenate([adj, deg[:, None]], axis=1), deg


def make_owner_select(adj_pack, window: int, axis, enabled: bool,
                      n_chunks: int = 1):
    """Owner-side column-select closure for CSR-sharded sampling hops
    (halo.dist_sample_csr_owner_select), or None when the trainer isn't in
    the CSR × exact-halo configuration. Chunks the exchange into independent
    query chunks like the exact gather (same ``_chunk_queries`` snap)."""
    if not (enabled and window > 0):
        return None
    indptr, indices, deg = adj_pack
    from tpu_sage.dist.halo import dist_sample_csr_owner_select

    def os_fn(ids, u):
        return _chunked_exchange(
            lambda i, uu: dist_sample_csr_owner_select(
                indptr, indices, deg, window, i, uu, axis),
            n_chunks, ids, u)

    return os_fn


def _chunk_queries(n_chunks: int, q: int) -> int:
    """Effective chunk count for a halo exchange of ``q`` queries — the
    single-device descriptor-stream-overlap lever (ops.snap_chunks) applied
    to the shard-local answering gathers inside the collectives."""
    from tpu_sage.ops import _CHUNK_MIN_ROWS, snap_chunks

    if n_chunks <= 1 or q < _CHUNK_MIN_ROWS:
        return 1
    return snap_chunks(n_chunks, q)


def _chunked_exchange(fn, n_chunks: int, *arrays):
    """Run a per-query halo exchange over equal query chunks and concatenate
    the answers — each chunk is element-identical to its slice of the full
    exchange, so values are unchanged and the chunks' answering gathers (and
    collectives) become independent descriptor streams. Shared by the exact
    feature gather and the CSR owner-select so the snap/tail rules live in
    one place (``_chunk_queries`` guarantees divisibility). ``arrays`` are
    the per-query leading-axis operands, sliced in lockstep."""
    q = arrays[0].shape[0]
    k = _chunk_queries(n_chunks, q)
    if k <= 1:
        return fn(*arrays)
    c = q // k
    parts = [fn(*(a[j * c:(j + 1) * c] for a in arrays)) for j in range(k)]
    return jnp.concatenate(parts, axis=0)


def make_gather(mode: str, n_shards: int, capacity_factor: float,
                n_chunks: int = 1):
    """Pick the halo-exchange implementation (SURVEY.md §5.7).

    Every implementation returns ``(rows, n_overflow)`` — a () int32 count of
    queries that exceeded bucket capacity and silently received fallback rows
    (always 0 for the exact modes). Callers must surface the count: an
    under-capacity bucketed run degrades quality (overflowed queries get zero
    feature rows / adjacency self-loops) and the only way to see it is this
    telemetry (plumbed into step metrics and the per-epoch JSON line).

    ``exact``: all_gather + psum_scatter — no drops, comm O(n_dev·q·d).
    With ``n_chunks`` > 1 the exchange splits into equal query chunks whose
    answering gathers (and collectives) are independent — the same
    descriptor-stream overlap that chunked single-device gathers measure
    (each chunk is element-identical to its slice of the full exchange).
    ``ring``: ppermute neighbor-hop chain, same bytes as exact but pipelines
    the exchange with the per-hop fill (the ring-attention-style fallback;
    not chunked — splitting would multiply the hop chains).
    ``bucketed``: MoE-style capacity routing — comm O(capacity·d); queries
    over capacity fall back to zero rows — overflow is rare with
    ``capacity_factor`` ≥ 2 on uniform neighbor distributions, but must be
    monitored, hence the count.
    """
    if mode == "exact":

        def exact(table, ids, axis):
            rows = _chunked_exchange(
                lambda i: dist_gather(table, i, axis), n_chunks, ids)
            return rows, _no_overflow()

        return exact
    if mode in ("ring", "pipelined"):
        # pipelined differs only on the LEVEL-FEATURE exchange (see
        # make_gather_levels); sampling hops are data-dependent chains and
        # gather one level at a time either way
        return lambda table, ids, axis: (
            dist_gather_ring(table, ids, axis, n_shards), _no_overflow()
        )

    if mode == "hier2d":
        # hierarchical (host, chip) routing: within-host ICI reduction before
        # the cross-host DCN hop (halo.dist_gather_2d). ``axis`` must be the
        # ('host', 'chip') name pair — enforced at trainer build.
        return lambda table, ids, axis: (
            dist_gather_2d(table, ids, axis[0], axis[1]), _no_overflow()
        )

    def bucketed(table, ids, axis):
        q = ids.shape[0]
        capacity = max(1, int(capacity_factor * q / n_shards))
        rows, n_ovf = dist_gather_bucketed(
            table, ids, axis, n_shards=n_shards, capacity=capacity
        )
        return rows, n_ovf[0].astype(jnp.int32)

    return bucketed


def make_gather_last(mode: str, n_shards: int, capacity_factor: float = 2.0,
                     n_chunks: int = 1):
    """Fused halo-gather + fanout-mean for the DEEPEST tree level.

    On the mean/gcn paths the deepest level's rows have one consumer — the
    first aggregation pass's per-root mean — which commutes with the
    cross-shard ownership sum, so the exchange ships the ``(q/fanout, d)``
    means instead of the raw rows (halo.dist_gather_fanout_mean: ``fanout×``
    less collective payload). Bucketed routing answers per query and cannot
    pre-reduce; it gathers full rows and means locally (uniform reduced
    contract, no comm saving). Returned rows are float32; the caller's
    dequant scale commutes with the mean.

    The consumer MUST be told the level is pre-reduced: pass
    ``last_reduced_fanout`` to ``encode_gathered``/``forward_gathered``.
    For gcn this is load-bearing (its reduce spans self, so the mean
    re-enters weighted — omitting the flag silently computes
    ``(x_self + mean)/2`` instead of ``(x_self + f·mean)/(f+1)``); only the
    mean aggregator happens to survive without it (fanout-1 reshape).

    Same ``(rows, n_overflow)`` contract as :func:`make_gather`.
    """
    if mode == "exact":

        def exact_mean(table, ids, fanout, axis):
            n_roots = ids.shape[0] // fanout
            k = _chunk_queries(n_chunks, ids.shape[0])
            k = min(k, n_roots)
            while k > 1 and n_roots % k:
                k -= 1
            if k <= 1:
                return (dist_gather_fanout_mean(table, ids, fanout, axis),
                        _no_overflow())
            cb = n_roots // k  # roots per chunk (exact)
            parts = [
                dist_gather_fanout_mean(
                    table, ids[j * cb * fanout : (j + 1) * cb * fanout],
                    fanout, axis,
                )
                for j in range(k)
            ]
            return jnp.concatenate(parts, axis=0), _no_overflow()

        return exact_mean
    if mode in ("ring", "pipelined"):
        return lambda table, ids, fanout, axis: (
            dist_gather_ring_fanout_mean(table, ids, fanout, axis, n_shards),
            _no_overflow(),
        )
    if mode == "hier2d":
        return lambda table, ids, fanout, axis: (
            dist_gather_2d(table, ids, axis[0], axis[1], fanout=fanout),
            _no_overflow(),
        )

    def bucketed_mean(table, ids, fanout, axis):
        rows, n_ovf = make_gather("bucketed", n_shards, capacity_factor)(
            table, ids, axis
        )
        rows = rows.astype(jnp.float32)
        red = jnp.mean(
            rows.reshape((ids.shape[0] // fanout, fanout) + rows.shape[1:]), axis=1
        )
        return red, n_ovf

    return bucketed_mean


def make_gather_levels(mode: str, n_shards: int):
    """Joint ALL-LEVELS feature exchange for the ``pipelined`` halo mode.

    Returns ``fn(table, levels, last_fanout, axis) -> (rows_list, ovf)`` or
    None for every other mode (they exchange level by level). The pipelined
    exchange interleaves the levels' ring chains hop-major so one level's
    ppermute rides the ICI while another level's fill computes — the explicit
    overlap structure of SURVEY.md §5.7 (halo.dist_gather_ring_pipelined).
    """
    if mode != "pipelined":
        return None

    def gather_levels(table, levels, last_fanout, axis):
        outs = dist_gather_ring_pipelined(
            table, levels, axis, n_shards, last_fanout=last_fanout
        )
        return outs, _no_overflow()

    return gather_levels


def gather_level_feats(gather, gather_last, feats, levels, fanouts, dq, axis,
                       gather_levels=None):
    """Halo-gather every level's feature rows (the halo exchange proper).

    With ``gather_last`` set (mean/gcn aggregator + ids-blind prep), the
    deepest level arrives pre-reduced to its per-root fanout means; the
    caller must then pass ``last_reduced_fanout=fanouts[-1]`` to
    ``encode_gathered``/``forward_gathered`` so the first pass consumes it
    via ``combine_from_summary`` (required for gcn's self-spanning reduce —
    see ``make_gather_last``; same contract as the single-device
    ``row_gather_fanout_mean`` path, nn/model.py::encode).

    Returns ``(level_rows, n_overflow)`` — the summed bucketed-halo overflow
    count across all level exchanges (0 for exact/ring).

    With ``gather_levels`` set (pipelined mode) every level ships in ONE
    hop-major interleaved ring; ``gather``/``gather_last`` are bypassed but
    the pre-reduction contract is identical (``gather_last is not None`` ⇔
    the deepest level arrives as per-root means).
    """
    if gather_levels is not None:
        lf = fanouts[-1] if gather_last is not None else None
        rows_list, ovf = gather_levels(feats, levels, lf, axis)
        return [dq(r) for r in rows_list], ovf
    out, ovf = [], _no_overflow()
    reduced = levels if gather_last is None else levels[:-1]
    for l in reduced:
        rows, o = gather(feats, l, axis)
        out.append(dq(rows))
        ovf = ovf + o
    if gather_last is not None:
        rows, o = gather_last(feats, levels[-1], fanouts[-1], axis)
        out.append(dq(rows))
        ovf = ovf + o
    return out, ovf


def epoch_perm(
    perm_base: jax.Array,     # STATIC seed-derived key (not the mutating state key)
    epoch: jnp.ndarray,       # () int32
    my: jnp.ndarray,          # () shard index
    L: int,
    count: jnp.ndarray,       # () true number of real fold nodes
) -> jnp.ndarray:
    """Random permutation of the shard's first ``count`` real fold slots,
    fixed for the whole epoch.

    Keyed on a STATIC seed-derived base key (plus epoch and shard), NOT the
    per-step-mutating state key — so the stepwise path, the scanned epoch
    path, and a crash-resume replay all walk the identical permutation for a
    given epoch. O(L log L); callers compute it once per epoch, not per step.
    """
    kp = jax.random.fold_in(jax.random.fold_in(perm_base, 77_003 + epoch), my)
    r = jax.random.uniform(kp, (L,))
    r = jnp.where(jnp.arange(L) < count, r, jnp.inf)
    return jnp.argsort(r)  # first `count` entries: random perm of real slots


def perm_batch(
    perm: jnp.ndarray,        # (L,) epoch permutation
    fold_row: jnp.ndarray,    # (L,) this shard's fold-id slots
    count: jnp.ndarray,       # () true number of real fold nodes
    t: jnp.ndarray,           # () step index within the epoch
    bps: int,
) -> jnp.ndarray:
    """Slots ``[t·bps, t·bps+bps) mod count`` of the epoch permutation —
    without replacement until the shard's group is exhausted, exactly uniform
    over the true group (the wrap-tiled tail is never sampled)."""
    n = jnp.maximum(count.astype(jnp.int32), 1)
    slot = (t * bps + jnp.arange(bps)) % n
    return fold_row[perm[slot]]


def epoch_batch_ids(
    perm_base: jax.Array,
    step: jnp.ndarray,
    fold_row: jnp.ndarray,
    count: jnp.ndarray,
    bps: int,
    steps_per_epoch: int,
    my: jnp.ndarray,
) -> jnp.ndarray:
    """Per-shard per-epoch permutation batching (single-device semantics):
    ``epoch_perm`` + ``perm_batch`` in one call — the stepwise path (the
    scanned epoch carries the perm instead of recomputing per step)."""
    epoch = step // steps_per_epoch
    t = step % steps_per_epoch
    perm = epoch_perm(perm_base, epoch, my, fold_row.shape[0], count)
    return perm_batch(perm, fold_row, count, t, bps)


def sample_level_distributed(
    key: jax.Array,
    adj_deg: jnp.ndarray,   # (m, max_degree+1) local rows: adj ‖ degree —
    # or a CSR pair view (m, 2·window+2): lo‖hi‖off‖deg (pair_window > 0)
    ids: jnp.ndarray,       # (cur,) global frontier ids on this shard
    fanout: int,
    axis: str,
    gather=None,
    pair_window: int = 0,
    owner_select=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One sampling hop with remote adjacency rows fetched by halo exchange.

    Returns ``(neighbor_ids, n_overflow)`` — overflow per the gather's
    ``(rows, count)`` contract (0 for exact/ring halo modes). With
    ``pair_window`` the exchanged rows carry the CSR pair layout and the
    column select shifts by the row's offset (values identical to dense).
    ``owner_select`` (CSR + exact halo): ``(ids, u) -> (q, fanout+1)``
    sampled values ‖ degree with the column-select moved to the OWNER
    (halo.dist_sample_csr_owner_select) — ~23× narrower answers, values
    bitwise-identical (the uniforms are drawn HERE with the same key/shape
    as the requester-side path and shipped)."""
    from tpu_sage.sample.sampler import select_columns

    if owner_select is not None:
        u = jax.random.uniform(key, (ids.shape[0], fanout))
        out = owner_select(ids, u)
        vals, r_deg = out[:, :-1], out[:, -1]
        nbr = jnp.where(r_deg[:, None] == 0, ids[:, None], vals)
        return nbr.reshape(-1), _no_overflow()
    if gather is None:
        gather = lambda t, i, a: (dist_gather(t, i, a), _no_overflow())
    rows, ovf = gather(adj_deg, ids, axis)            # (cur, width)
    if pair_window:
        r_adj = rows[:, : 2 * pair_window]
        shift = rows[:, 2 * pair_window]
        r_deg = rows[:, 2 * pair_window + 1]
    else:
        r_adj, r_deg = rows[:, :-1], rows[:, -1]
        shift = None
    deg = jnp.maximum(r_deg, 1)
    u = jax.random.uniform(key, (ids.shape[0], fanout))
    cols = jnp.minimum((u * deg[:, None].astype(u.dtype)).astype(jnp.int32),
                       deg[:, None] - 1)
    if shift is not None:
        cols = shift[:, None] + cols
    nbr = select_columns(r_adj, cols)  # vectorized; avoids TPU element gather
    # degree-0 rows (padding nodes) self-loop, matching single-device semantics
    nbr = jnp.where(r_deg[:, None] == 0, ids[:, None], nbr)
    return nbr.reshape(-1), ovf


class PartitionedTrainer:
    """Multi-chip trainer over a node-sharded graph.

    Drop-in sibling of ``tpu_sage.train.trainer.Trainer`` for the partitioned
    path; same config surface, same optimizer construction.
    """

    def __init__(
        self,
        model: GSSupervised,
        config: TrainConfig,
        mesh: Mesh,
        shard_size: int,
        steps_per_epoch: int,
        task: str = "classification",
        axis: str = "data",
        csr_window: int = 0,
    ):
        self.model = model
        self.config = config
        self.mesh = mesh
        self.axis = axis
        self.shard_size = shard_size
        # > 0 ⇔ the TRAIN graph is CSR-sharded (CSRShardedGraph) with this
        # window width; the eval graph derives its own window at eval time
        self.csr_window = csr_window
        self.n_shards = axis_size(mesh, axis)
        self.loss_fn = loss_lookup[task]
        self.steps_per_epoch = steps_per_epoch
        self.tx = build_optimizer(config, steps_per_epoch)
        self.batch_per_shard = max(1, config.batch_size // self.n_shards)
        self.halo_mode = resolve_halo_mode(
            getattr(config, "halo", "auto"), self.n_shards
        )
        if self.halo_mode == "hier2d" and isinstance(axis, str):
            raise ValueError(
                "halo='hier2d' routes within-host before cross-host and needs "
                "a 2-D mesh with axis=('host', 'chip'); got a flat axis "
                f"{axis!r} — build the mesh with make_mesh(axis_names="
                "('host', 'chip'), shape=(n_hosts, n_chips))"
            )
        # default 10 — the round-4 measured winner at the headline graph
        # (closes the unchunked exchange's +62% overhead to +0.5%; see
        # TrainConfig.halo_chunks for the sweep table)
        halo_chunks = getattr(config, "halo_chunks", 10)
        self.halo_chunks = halo_chunks
        # CSR shards + exact halo: move the sampling hops' fanout
        # column-select to the OWNER — answers ship fanout+1 ints instead of
        # the 2·window+2 pair rows (halo.dist_sample_csr_owner_select;
        # values bitwise-identical). Other halo modes keep pair answers.
        self.owner_select_on = (
            csr_window > 0 and self.halo_mode == "exact"
            and getattr(config, "csr_owner_select", True)
        )
        self.gather = make_gather(
            self.halo_mode,
            self.n_shards,
            getattr(config, "halo_capacity_factor", 2.0),
            n_chunks=halo_chunks,
        )
        # fused deepest-level gather+mean (see make_gather_last): valid only
        # when the first aggregation pass means over the fanout and the prep
        # is ids-blind and linear. config.fuse_last="off" disables (the same
        # whole-program A/B gate as the single-device path, nn/model.py);
        # "all" behaves like "auto" here — the fusion is already gated to
        # mean/gcn, so the lstm carve-out "all" flips never applies.
        fl = overrides.fuse_last(getattr(config, "fuse_last", "auto"))
        self.gather_last = (
            make_gather_last(
                self.halo_mode,
                self.n_shards,
                getattr(config, "halo_capacity_factor", 2.0),
                n_chunks=halo_chunks,
            )
            if model.aggregator_class in ("mean", "gcn")
            and model.prep_class == "identity"
            and fl != "off"
            else None
        )
        self.gather_levels = make_gather_levels(self.halo_mode, self.n_shards)
        self.halo_timings = None  # {mode: ms/step} when halo="measured" raced
        self.halo_fallback = None  # sub-noise abstention reason, or None
        self._step_fn = None
        self._epoch_fns = {}
        self._eval_fns = {}  # keyed on the eval graph's csr window (0 = dense)
        self._eval_graph = None  # cached (graph, shard_size) for evaluate()
        self._eval_graph_key = None  # the GraphStore the cache was built from
        self._eval_graph_kind = None  # "dense" | "csr" — single slot
        self._eval_dense_only = False  # sticky: once exact eval runs on a
        # CSR trainer, ALL evals ride the dense eval shard (sampled eval
        # works on it too) — otherwise alternating exact/sampled epochs
        # would keep a third full feature table resident

    # -- construction helpers ----------------------------------------------

    @staticmethod
    def _sharded_inputs(store: GraphStore, config: TrainConfig, mesh: Mesh,
                        axis: str, csr: bool = False):
        """Shared sharding front-end: node-sharded graph + fold table.
        Returns ``(graph, shard_size, steps_per_epoch, fold_ids_d, fold_w_d)``."""
        from tpu_sage.dist.partition import shard_graph_csr

        cd = getattr(config, "compute_dtype", "float32")
        graph, m = (shard_graph_csr if csr else shard_graph)(
            store, mesh, train=True, axis=axis,
            # match the single-device upload (trainer.py device_graph): dense
            # feature shards live in the compute dtype, so bf16 configs also
            # halve the halo-exchange bytes
            feat_dtype=None if cd == "float32" else cd,
            quantize=getattr(config, "feature_int8", False),
        )
        n_shards = axis_size(mesh, axis)
        fold_ids, fold_w = shard_fold(store.folds["train"], n_shards, m)
        steps_per_epoch = max(1, len(store.folds["train"]) // config.batch_size)
        from tpu_sage.dist.partition import put_sharded

        fold_ids_d = put_sharded(fold_ids.astype(np.int32), mesh, P(axis))
        fold_w_d = put_sharded(fold_w, mesh, P(axis))
        return graph, m, steps_per_epoch, fold_ids_d, fold_w_d

    @classmethod
    def from_store(
        cls, store: GraphStore, config: TrainConfig, mesh: Mesh,
        axis: str = "data", csr: bool = False,
    ) -> Tuple["PartitionedTrainer", DeviceGraph, jnp.ndarray, jnp.ndarray]:
        """Build trainer + sharded graph + sharded fold table from a host
        store. ``csr=True`` shards the adjacency as per-shard CSR blocks
        (CSRShardedGraph — nnz-shaped HBM instead of m·max_degree)."""
        graph, m, steps_per_epoch, fold_ids_d, fold_w_d = cls._sharded_inputs(
            store, config, mesh, axis, csr=csr
        )
        model = build_model(config, store.n_nodes, store.n_classes)
        window = getattr(graph, "window", 0)
        halo_timings = halo_fallback = None
        if getattr(config, "halo", "auto") == "measured":
            winner, halo_timings, halo_fallback = measure_halo_mode(
                lambda mode: cls(model, config.replace(halo=mode), mesh, m,
                                 steps_per_epoch, task=store.task, axis=axis,
                                 csr_window=window),
                store.feat_dim,
                lambda tr, st, n: tr.train_epoch(st, graph, fold_ids_d,
                                                 fold_w_d, n_steps=n),
                halo_candidates(axis, axis_size(mesh, axis)),
                n_steps=getattr(config, "halo_measure_steps", None),
            )
            config = config.replace(halo=winner)
        trainer = cls(model, config, mesh, m, steps_per_epoch, task=store.task,
                      axis=axis, csr_window=window)
        trainer.halo_timings = halo_timings
        trainer.halo_fallback = halo_fallback
        # the eval graph differs only in adjacency — _full_graph_shard
        # adopts these feature shards instead of re-uploading the table
        trainer._train_store = store
        trainer._train_feats = (graph.feats, graph.feat_scale)
        return trainer, graph, fold_ids_d, fold_w_d

    def init_state(self, feat_dim: int, key: Optional[jax.Array] = None) -> TrainState:
        if key is None:
            key = jax.random.key(self.config.seed)
        fanouts = self.model.fanouts(train=True)
        b = self.batch_per_shard
        levels = [jnp.zeros((b,), jnp.int32)]
        feats = [jnp.zeros((b, feat_dim))]
        for f in fanouts:
            levels.append(jnp.zeros((levels[-1].shape[0] * f,), jnp.int32))
            feats.append(jnp.zeros((levels[-1].shape[0], feat_dim)))

        rep = NamedSharding(self.mesh, P())

        # Build the replicated state INSIDE a jit with out_shardings: this is
        # the multi-host-safe placement path (a plain device_put of host
        # values cannot target non-addressable devices of a cross-process
        # mesh; the jit'd computation runs identically on every process).
        def make(k):
            k, init_key, state_key = jax.random.split(k, 3)
            params = self.model.init(
                init_key, levels, feats, method=self.model.forward_gathered
            )
            opt_state = self.tx.init(params)
            return TrainState(
                params=params, opt_state=opt_state,
                step=jnp.zeros((), jnp.int32), key=state_key,
            )

        return jax.jit(make, out_shardings=rep)(key)

    # -- the sharded step ---------------------------------------------------

    def _make_step(self):
        axis = self.axis
        fanouts = self.model.fanouts(train=True)
        model, tx, loss_fn = self.model, self.tx, self.loss_fn
        bps = self.batch_per_shard
        gather = self.gather
        gather_last = self.gather_last
        gather_levels = self.gather_levels
        lrf = fanouts[-1] if gather_last is not None else None
        spe = self.steps_per_epoch
        window = self.csr_window
        owner_on, hchunks = self.owner_select_on, self.halo_chunks
        perm_base = jax.random.key(self.config.seed ^ 0x0BA7C4)

        def shard_step(params, opt_state, step, key, adj_pack, feats, fscale,
                       targets, fold_ids, fold_w):
            # locals: adj_pack (dense (adj, deg) or CSR (indptr, indices,
            # deg)), feats (m, F), targets (m, ...), fold_ids (1, L),
            # fold_w (1,) — fold_w is the true group count; fscale (F,)
            # replicated dequant scales (ones when feats is dense)
            my = lax.axis_index(axis)
            adj_deg, deg = build_adj_view(adj_pack, window)
            os_fn = make_owner_select(adj_pack, window, axis, owner_on, hchunks)
            m = deg.shape[0]
            offset = my * m
            k = jax.random.fold_in(jax.random.fold_in(key, step), my)
            _, k_sample = jax.random.split(k)

            ids = epoch_batch_ids(perm_base, step, fold_ids[0], fold_w[0],
                                  bps, spe, my)
            tgt = targets[ids - offset]
            w = fold_w[0]

            # halo-gather raw stored rows (int8 when quantized — 4× fewer
            # ICI bytes than f32), dequantize at the requester
            dq = lambda rows: rows.astype(fscale.dtype) * fscale

            def fwd(p):
                levels, ovf = [ids], _no_overflow()
                ks = jax.random.split(k_sample, len(fanouts))
                for i, f in enumerate(fanouts):
                    nbr, o = sample_level_distributed(
                        ks[i], adj_deg, levels[-1], f, axis, gather,
                        pair_window=window, owner_select=os_fn,
                    )
                    levels.append(nbr)
                    ovf = ovf + o
                level_feats, o = gather_level_feats(
                    gather, gather_last, feats, levels, fanouts, dq, axis,
                    gather_levels=gather_levels,
                )
                ovf = ovf + o
                logits = model.apply(
                    p, levels, level_feats, lrf, method=model.forward_gathered
                )
                local_loss = loss_fn(logits, tgt)
                # weight shards by fold occupancy so wrap-padding doesn't skew
                scale = w / jnp.maximum(lax.psum(w, axis), 1e-12)
                return local_loss * scale, ovf

            (loss_s, ovf), grads = jax.value_and_grad(fwd, has_aux=True)(params)
            loss = lax.psum(loss_s, axis)
            ovf = lax.psum(ovf, axis)
            grads = lax.psum(grads, axis)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt, step + 1, key, loss, ovf

        rep, shd = P(), P(axis)
        mapped = shard_map(
            shard_step,
            mesh=self.mesh,
            in_specs=(rep, rep, rep, rep, shd, shd, rep, shd, shd, shd),
            out_specs=(rep, rep, rep, rep, rep, rep),
            check_vma=False,
        )

        @partial(jax.jit, donate_argnums=(0,))
        def step_fn(state: TrainState, graph: DeviceGraph, fold_ids, fold_w):
            new_key = jax.random.fold_in(state.key, state.step)
            params, opt_state, step, _, loss, ovf = mapped(
                state.params, state.opt_state, state.step, state.key,
                adj_pack_of(graph), graph.feats, graph.feat_scale,
                graph.targets, fold_ids, fold_w,
            )
            return (
                TrainState(params=params, opt_state=opt_state, step=step, key=new_key),
                {"loss": loss, "halo_overflow": ovf},
            )

        return step_fn

    def train_step(self, state, graph, fold_ids, fold_w):
        if self._step_fn is None:
            self._step_fn = self._make_step()
        return self._step_fn(state, graph, fold_ids, fold_w)

    def _make_epoch(self, n_steps: int):
        """Scanned multi-step path: ``n_steps`` partitioned train steps in one
        XLA computation — one host dispatch per epoch, the multi-chip
        counterpart of ``Trainer.train_epoch`` (per-step host syncs cost
        ~35 ms each through the axon tunnel)."""
        axis = self.axis
        fanouts = self.model.fanouts(train=True)
        model, tx, loss_fn = self.model, self.tx, self.loss_fn
        bps = self.batch_per_shard
        gather = self.gather
        gather_last = self.gather_last
        gather_levels = self.gather_levels
        lrf = fanouts[-1] if gather_last is not None else None
        spe = self.steps_per_epoch
        window = self.csr_window
        owner_on, hchunks = self.owner_select_on, self.halo_chunks
        perm_base = jax.random.key(self.config.seed ^ 0x0BA7C4)

        def shard_epoch(params, opt_state, step0, key, adj_pack, feats, fscale,
                        targets, fold_ids, fold_w):
            my = lax.axis_index(axis)
            adj_deg, deg = build_adj_view(adj_pack, window)
            os_fn = make_owner_select(adj_pack, window, axis, owner_on, hchunks)
            m = deg.shape[0]
            offset = my * m
            dq = lambda rows: rows.astype(fscale.dtype) * fscale
            w = fold_w[0]
            count = fold_w[0]
            L = fold_ids.shape[1]
            perm0 = epoch_perm(perm_base, step0 // spe, my, L, count)

            def body(carry, _):
                params, opt_state, step, perm = carry
                t = step % spe
                # recompute the permutation only at epoch boundaries; it is
                # carried through the scan otherwise (O(L log L) once per
                # epoch, not per step)
                perm = lax.cond(
                    t == 0,
                    lambda p: epoch_perm(perm_base, step // spe, my, L, count),
                    lambda p: p,
                    perm,
                )
                k = jax.random.fold_in(jax.random.fold_in(key, step), my)
                _, k_sample = jax.random.split(k)
                ids = perm_batch(perm, fold_ids[0], count, t, bps)
                tgt = targets[ids - offset]

                def fwd(p):
                    levels, ovf = [ids], _no_overflow()
                    ks = jax.random.split(k_sample, len(fanouts))
                    for i, f in enumerate(fanouts):
                        nbr, o = sample_level_distributed(
                            ks[i], adj_deg, levels[-1], f, axis, gather,
                            pair_window=window, owner_select=os_fn,
                        )
                        levels.append(nbr)
                        ovf = ovf + o
                    level_feats, o = gather_level_feats(
                        gather, gather_last, feats, levels, fanouts, dq, axis,
                    gather_levels=gather_levels,
                    )
                    ovf = ovf + o
                    logits = model.apply(
                        p, levels, level_feats, lrf,
                        method=model.forward_gathered,
                    )
                    scale = w / jnp.maximum(lax.psum(w, axis), 1e-12)
                    return loss_fn(logits, tgt) * scale, ovf

                (loss_s, ovf), grads = jax.value_and_grad(fwd, has_aux=True)(params)
                loss = lax.psum(loss_s, axis)
                ovf = lax.psum(ovf, axis)
                grads = lax.psum(grads, axis)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, step + 1, perm), (loss, ovf)

            (params, opt_state, step, _), (losses, ovfs) = jax.lax.scan(
                body, (params, opt_state, step0, perm0), None, length=n_steps
            )
            return params, opt_state, step, losses.mean(), ovfs.sum()

        rep, shd = P(), P(axis)
        mapped = shard_map(
            shard_epoch,
            mesh=self.mesh,
            in_specs=(rep, rep, rep, rep, shd, shd, rep, shd, shd, shd),
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False,
        )

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(state: TrainState, graph: DeviceGraph, fold_ids, fold_w):
            new_key = jax.random.fold_in(state.key, state.step)
            params, opt_state, step, loss, ovf = mapped(
                state.params, state.opt_state, state.step, state.key,
                adj_pack_of(graph), graph.feats, graph.feat_scale,
                graph.targets, fold_ids, fold_w,
            )
            return (
                TrainState(params=params, opt_state=opt_state, step=step, key=new_key),
                {"loss": loss, "halo_overflow": ovf},
            )

        return epoch_fn

    def train_epoch(self, state, graph, fold_ids, fold_w,
                    n_steps: Optional[int] = None):
        """Run ``n_steps`` (default: steps_per_epoch) partitioned steps as one
        scanned computation."""
        n = int(n_steps or self.steps_per_epoch)
        if self._epoch_fns.get(n) is None:
            self._epoch_fns[n] = self._make_epoch(n)
        return self._epoch_fns[n](state, graph, fold_ids, fold_w)


    def _make_eval(self, task: str, window: int):
        axis = self.axis
        fanouts = self.model.fanouts(train=False)
        model = self.model
        bps = self.batch_per_shard
        gather = self.gather
        gather_last = self.gather_last
        gather_levels = self.gather_levels
        lrf = fanouts[-1] if gather_last is not None else None
        owner_on, hchunks = self.owner_select_on, self.halo_chunks

        def shard_eval(params, key, adj_pack, feats, fscale, targets, ids, mask):
            # ids/mask local: (1, n_chunks, bps); targets local (m, ...)
            my = lax.axis_index(axis)
            adj_deg, deg = build_adj_view(adj_pack, window)
            os_fn = make_owner_select(adj_pack, window, axis, owner_on, hchunks)
            m = deg.shape[0]
            offset = my * m
            dq = lambda rows: rows.astype(fscale.dtype) * fscale
            key = jax.random.fold_in(key, my)

            def chunk_stats(k, batch):
                cids, cmask = batch
                k, sub = jax.random.split(k)
                ks = jax.random.split(sub, len(fanouts))
                levels = [cids]
                for i, f in enumerate(fanouts):
                    levels.append(
                        sample_level_distributed(
                            ks[i], adj_deg, levels[-1], f, axis, gather,
                            pair_window=window, owner_select=os_fn,
                        )[0]
                    )
                level_feats, _ = gather_level_feats(
                    gather, gather_last, feats, levels, fanouts, dq, axis,
                    gather_levels=gather_levels,
                )
                logits = model.apply(
                    params, levels, level_feats, lrf, method=model.forward_gathered
                )
                tgt = targets[cids - offset]
                if task == "classification":
                    correct = jnp.sum(
                        (jnp.argmax(logits, -1) == tgt.astype(jnp.int32)) * cmask
                    )
                    return k, jnp.array([correct, cmask.sum(), 0.0])
                if task == "multilabel_classification":
                    preds = (logits > 0).astype(jnp.float32) * cmask[:, None]
                    t = tgt.astype(jnp.float32) * cmask[:, None]
                    tp = jnp.sum(preds * t)
                    fp = jnp.sum(preds * (1 - t) * cmask[:, None])
                    fn = jnp.sum((1 - preds) * t * cmask[:, None])
                    return k, jnp.array([tp, fp, fn])
                # regression / regression_mae: masked error sums + count
                # (mirrors Trainer.eval_fold's se/ae/cnt stats vector)
                err = logits - tgt.astype(logits.dtype)
                se = jnp.sum(jnp.square(err) * cmask[:, None])
                ae = jnp.sum(jnp.abs(err) * cmask[:, None])
                cnt = cmask.sum() * logits.shape[-1]
                return k, jnp.array([se, ae, cnt])

            _, stats = jax.lax.scan(chunk_stats, key, (ids[0], mask[0]))
            return lax.psum(stats.sum(axis=0), axis)

        rep, shd = P(), P(axis)
        mapped = shard_map(
            shard_eval,
            mesh=self.mesh,
            in_specs=(rep, rep, shd, shd, rep, shd, shd, shd),
            out_specs=rep,
            check_vma=False,
        )
        return jax.jit(mapped)

    def _full_graph_shard(self, store: GraphStore):
        """Node-sharded FULL graph for evaluation, cached keyed on store
        identity: evaluating against a different store must re-shard, not
        silently reuse the previous store's graph. The key is a STRONG
        reference to the store object (``is`` comparison) — a bare ``id()``
        would be unsafe because CPython reuses addresses of collected
        objects; pinning the store keeps the id meaningful."""
        from tpu_sage.dist.partition import shard_graph_csr

        want_dense = self.csr_window == 0 or self._eval_dense_only
        kind = "dense" if want_dense else "csr"
        if (self._eval_graph is None or self._eval_graph_key is not store
                or self._eval_graph_kind != kind):
            cd = getattr(self.config, "compute_dtype", "float32")
            shard_fn = shard_graph if want_dense else shard_graph_csr
            # same store + same storage config (both derive from
            # self.config): adopt the TRAINING graph's feature shards — the
            # eval graph differs only in adjacency, so re-uploading would
            # double the dominant table's residency (round-5 review finding)
            reuse = (self._train_feats
                     if getattr(self, "_train_store", None) is store
                     else None)
            self._eval_graph = shard_fn(
                store, self.mesh, train=False, axis=self.axis,
                feat_dtype=None if cd == "float32" else cd,
                quantize=getattr(self.config, "feature_int8", False),
                reuse_feats=reuse,
            )
            self._eval_graph_key = store
            self._eval_graph_kind = kind
        return self._eval_graph

    def evaluate_exact(self, state, store: GraphStore, fold: str = "val") -> float:
        """Variance-free fold metric via SHARDED exact layer-wise inference
        (nn/full_graph.embed_all_nodes_partitioned) — the serving-mode
        number, no sampling in the eval path at all. Supported for the
        permutation-invariant aggregators."""
        from tpu_sage.dist.partition import fetch_replicated
        from tpu_sage.nn.full_graph import embed_all_nodes_partitioned
        from tpu_sage.train.trainer import fold_metric_np

        # multi-host-safe end to end: the eval-graph shard goes up through
        # put_sharded (each process contributes its shards) and the sharded
        # logits come back through fetch_replicated (jit-replicate, then a
        # host copy every process can take) — no hand-assembly required.
        # CSR training storage densifies the EVAL graph only (the exact pass
        # walks whole adjacency rows; sharded, so m·max_degree per chip);
        # sticky, so subsequent sampled evals reuse the same dense shard
        # instead of keeping a third full feature table resident
        self._eval_dense_only = True
        graph_full, _ = self._full_graph_shard(store)
        logits = fetch_replicated(
            embed_all_nodes_partitioned(
                self.model, state.params, graph_full, self.mesh,
                axis=self.axis, with_head=True,
            )
        )[: store.n_nodes]
        ids = store.folds[fold]
        return fold_metric_np(store.task, logits[ids], store.targets[ids])

    def evaluate(self, state, store: GraphStore, fold: str = "val",
                 seed: int = 0) -> float:
        """Full-fold metric on the node-sharded FULL graph (inductive
        protocol, SURVEY.md §3.5), exact counts via masked padding. Supports
        all four tasks; regression metrics are negated (higher = better),
        matching ``Trainer.eval_fold``."""
        from tpu_sage.dist.partition import shard_fold_masked

        graph_full, m = self._full_graph_shard(store)
        ids, mask = shard_fold_masked(
            store.folds[fold], self.n_shards, m, pad_to_multiple=self.batch_per_shard
        )
        n_chunks = ids.shape[1] // self.batch_per_shard
        ids3 = ids.reshape(self.n_shards, n_chunks, self.batch_per_shard)
        mask3 = mask.reshape(self.n_shards, n_chunks, self.batch_per_shard)
        from tpu_sage.dist.partition import put_sharded

        ids_d = put_sharded(ids3.astype(np.int32), self.mesh, P(self.axis))
        mask_d = put_sharded(mask3, self.mesh, P(self.axis))

        ew = getattr(graph_full, "window", 0)
        if self._eval_fns.get(ew) is None:
            self._eval_fns[ew] = self._make_eval(store.task, ew)
        stats = np.asarray(
            self._eval_fns[ew](state.params, jax.random.key(seed),
                               adj_pack_of(graph_full), graph_full.feats,
                               graph_full.feat_scale, graph_full.targets,
                               ids_d, mask_d)
        )
        if store.task == "classification":
            return float(stats[0] / max(stats[1], 1.0))
        if store.task == "multilabel_classification":
            tp, fp, fn = stats
            return float(2 * tp / max(2 * tp + fp + fn, 1e-12))
        se, ae, cnt = stats
        if store.task == "regression":
            return float(-se / max(cnt, 1.0))
        return float(-ae / max(cnt, 1.0))


def fit_partitioned(
    store: GraphStore,
    config: TrainConfig,
    mesh: Optional[Mesh] = None,
    log=None,
    eval_every_epoch: bool = True,
    resume_from: Optional[str] = None,
    checkpoint_every: int = 0,
    csr: bool = False,
):
    """``fit()``-equivalent loop for the node-sharded multi-chip path.

    Same contract as ``tpu_sage.train.trainer.fit``: per-epoch scanned
    training, JSON metric line per epoch, optional validation on the full
    graph (all four tasks), checkpoint resume. ``mesh`` defaults to one
    ``data`` axis over all visible devices. ``checkpoint_every`` > 0 writes
    ``resume_from`` every N epochs mid-run (SURVEY.md §5.4 "every N steps and
    at end"; the product step unit is the scanned epoch), and resume restarts
    at the epoch after the checkpointed step — a killed run loses at most N
    epochs.
    """
    import json as _json
    import os
    import time

    if log is None:
        log = lambda d: print(_json.dumps(d), flush=True)
    mesh, axis = resolve_mesh_axis(config, mesh)

    from tpu_sage.train.checkpoint import (BestTracker, maybe_checkpoint,
                                           resume_state)

    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
        store, config, mesh, axis=axis, csr=csr
    )
    tracker = BestTracker(config, resume_from, log)
    # one line naming the RESOLVED halo implementation (config may say
    # "auto"/"measured"); a measured race also reports its per-mode ms/step
    log({"n_shards": trainer.n_shards, "halo": trainer.halo_mode,
         **({"halo_measured_ms": trainer.halo_timings}
            if trainer.halo_timings else {}),
         **({"halo_measured_fallback": trainer.halo_fallback}
            if getattr(trainer, "halo_fallback", None) else {}),
         **({"csr_window": trainer.csr_window} if csr else {})})

    use_exact_val = False
    if getattr(config, "exact_val", False):
        from tpu_sage.nn.full_graph import exact_supported

        # works cross-process too: evaluate_exact shards the eval graph via
        # put_sharded and fetches logits via fetch_replicated
        use_exact_val = exact_supported(trainer.model)
        if not use_exact_val:
            log({"note": "exact_val unsupported for this aggregator; "
                         "falling back to sampled validation"})
        elif csr:
            log({"note": "exact_val densifies the EVAL graph shards "
                         "(m*max_degree per chip; training stays CSR)"})

    def eval_fold(state, fold, seed, exact=True):
        if use_exact_val and exact:
            return trainer.evaluate_exact(state, store, fold=fold)
        return trainer.evaluate(state, store, fold=fold, seed=seed)

    def exact_this_epoch(epoch):
        k = max(1, getattr(config, "exact_val_every", 1))
        return (epoch + 1) % k == 0 or epoch == config.epochs - 1

    state = trainer.init_state(feat_dim=store.feat_dim)
    state, start_epoch = resume_state(state, resume_from,
                                      trainer.steps_per_epoch, log)

    history = []
    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        state, m = trainer.train_epoch(state, graph, fold_ids, fold_w)
        rec = {
            "epoch": epoch,
            "train_loss": float(m["loss"]),
            "elapsed": round(time.time() - t0, 4),
            "n_shards": trainer.n_shards,
        }
        if trainer.halo_mode == "bucketed":
            # visibility for the capacity mechanism's one failure mode: an
            # under-capacity run silently degrades quality (overflowed
            # queries got fallback rows) — the count must be in the log
            rec["halo_overflow"] = int(m["halo_overflow"])
        exact_now = exact_this_epoch(epoch)
        if eval_every_epoch and len(store.folds["val"]):
            rec["val_metric"] = eval_fold(state, "val", config.seed + 1,
                                          exact=exact_now)
        history.append(rec)
        log(rec)
        maybe_checkpoint(state, resume_from, checkpoint_every, epoch, log,
                         config=config)
        # exact_val_every>1: the tracker compares exact epochs only (see
        # trainer.fit — mixing sampled and exact metric streams poisons
        # save_best/patience on the serving metric)
        tracked = rec.get("val_metric") if (not use_exact_val or exact_now) \
            else None
        if tracker.update(tracked, state):
            break
    if eval_every_epoch and len(store.folds.get("test", [])):
        log({"final_test_metric": eval_fold(state, "test", config.seed + 2)})
    return trainer, state, history
