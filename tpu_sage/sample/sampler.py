"""On-device fixed-fanout uniform neighbor sampling.

The reference's ``UniformNeighborSampler`` (SURVEY.md §2.1: gather ``adj[ids]``
then pick ``n_samples`` random columns; static output shape) becomes a pure
jittable function of a PRNG key. Sampling is **with replacement** from the
true neighbors (columns ``[0, max(degree, 1))``), matching the upstream
GraphSAGE behavior when ``degree < fanout``; padding slots are never selected
(see graph_data.py for the padding idiom), and degree-0 nodes self-loop.

TPU notes: the whole thing is one ``uniform`` + one 2-D gather per layer —
static shapes, no host sync, fuses into the surrounding step under jit.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from tpu_sage.ops import row_gather, row_gather_chunked


def uniform_neighbor_sample(
    key: jax.Array,
    adj: jnp.ndarray,
    degrees: jnp.ndarray,
    ids: jnp.ndarray,
    n_samples: int,
) -> jnp.ndarray:
    """Sample ``n_samples`` neighbors per node, with replacement.

    Args:
      key: PRNG key.
      adj: ``(n_nodes, max_degree)`` int32 padded neighbor table.
      degrees: ``(n_nodes,)`` int32 true degrees (≤ max_degree).
      ids: ``(B,)`` int32 node ids.
      n_samples: fanout (static).

    Returns:
      ``(B, n_samples)`` int32 neighbor ids.

    The hop gathers are CHUNKED since round 5 (bit-identical; below the
    4096-row threshold — every supervised hop but the deepest — they fall
    back to one gather): the unsupervised tree's hop-2 frontier is 153,600
    queries and its degree/adjacency gathers were single serial descriptor
    streams at 20.0 ns/row (bench_logs/r5_unsup_breakdown.log). Measured
    whole-step: a WASH on both workloads (supervised 62.29M unchanged,
    unsup 53.11M vs 53.07M — bench_logs/r5_sampler_chunk.log); kept because
    it is free, matches the framework-wide lowering policy, and the stage
    rate question is settled either way. ``TPU_SAGE_GATHER_CHUNKS=1``
    restores the unchunked form whole-program.
    """
    ids = ids.astype(jnp.int32)
    deg = jnp.maximum(row_gather_chunked(degrees, ids), 1)  # degree-0 -> col 0 == self pad
    u = jax.random.uniform(key, (ids.shape[0], n_samples))
    # floor(u * deg) in [0, deg); guard the u==1.0-epsilon edge with a min.
    cols = jnp.minimum((u * deg[:, None].astype(u.dtype)).astype(jnp.int32), deg[:, None] - 1)
    rows = row_gather_chunked(adj, ids)  # (B, max_degree) — contiguous 512B+ row reads
    return select_columns(rows, cols)


def select_columns(rows: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """``out[b, k] = rows[b, cols[b, k]]`` without an element gather.

    A 2-D element gather of B·k scalars compiles to serial random loads on
    TPU (measured: ~2.5 ms/step of the Reddit bench — 37% of the whole step).
    The one-hot compare-select runs on the VPU as B·k·max_degree fused
    compare+select+reduce ops (~17M for the Reddit shapes — sub-0.1 ms) and
    is bit-identical to the gather.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, rows.shape[-1]), 2)
    hit = cols[:, :, None] == iota                       # (B, k, max_degree)
    return jnp.sum(jnp.where(hit, rows[:, None, :], 0), axis=-1)


def sample_tree(
    key: jax.Array,
    adj: jnp.ndarray,
    degrees: jnp.ndarray,
    ids: jnp.ndarray,
    fanouts: Sequence[int],
) -> List[jnp.ndarray]:
    """Build the static-shape neighborhood tree bottom-up (SURVEY.md §3.2).

    Level 0 is ``ids`` with shape ``(B,)``; level ``l`` has shape
    ``(B * prod(fanouts[:l]),)``. Returns the list of flat id arrays per level.
    The model consumes these levels; keeping sampling outside the network is
    the determinism seam the parity tests rely on (SURVEY.md §4.2): tests can
    inject precomputed tables instead.
    """
    levels = [ids.astype(jnp.int32)]
    for fanout in fanouts:
        key, sub = jax.random.split(key)
        nbr = uniform_neighbor_sample(sub, adj, degrees, levels[-1], fanout)
        levels.append(nbr.reshape(-1))
    return levels


def pack_adjacency(adj: jnp.ndarray, degrees: jnp.ndarray) -> jnp.ndarray:
    """``(n, max_degree+1)`` int32: adjacency row ‖ degree.

    Packs degree into the adjacency row so each sampling hop issues one row
    gather instead of two. (Round-2b note: gathers cost ~10 ns/row +
    ~5 ns/KB — the earlier "0.6 ms per call" reading was dispatch tax, see
    RESULTS.md "Efficiency analysis" — so at these query counts the packed
    and unpacked forms measure the same; kept as an option.)"""
    return jnp.concatenate([adj, degrees[:, None]], axis=1)


def sample_tree_packed(
    key: jax.Array,
    adj_deg: jnp.ndarray,
    ids: jnp.ndarray,
    fanouts: Sequence[int],
) -> List[jnp.ndarray]:
    """``sample_tree`` against a packed table: one gather per hop.

    Draws the SAME samples as ``sample_tree`` for the same key (identical
    split structure and uniform shapes) — the two paths are interchangeable.
    """
    levels = [ids.astype(jnp.int32)]
    for fanout in fanouts:
        key, sub = jax.random.split(key)
        cur = levels[-1]
        rows = row_gather(adj_deg, cur)               # ONE gather: adj ‖ deg
        r_adj, deg = rows[:, :-1], jnp.maximum(rows[:, -1], 1)
        u = jax.random.uniform(sub, (cur.shape[0], fanout))
        cols = jnp.minimum(
            (u * deg[:, None].astype(u.dtype)).astype(jnp.int32), deg[:, None] - 1
        )
        levels.append(select_columns(r_adj, cols).reshape(-1))
    return levels


def gather_levels(feats: jnp.ndarray, levels: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Feature rows for every tree level in ONE gather call (per-call-cost
    amortization; see ``pack_adjacency``)."""
    sizes = [l.shape[0] for l in levels]
    all_rows = row_gather(feats, jnp.concatenate(levels))
    out, off = [], 0
    for s in sizes:
        out.append(all_rows[off : off + s])
        off += s
    return out


class UniformNeighborSampler:
    """Object wrapper mirroring the reference API (``sampler(ids, n_samples)``).

    Binds the adjacency once; each call consumes an explicit PRNG key — the
    RNG-architecture rule (SURVEY.md §7.3 #2) is one threaded key, never hidden
    state.
    """

    def __init__(self, adj: jnp.ndarray, degrees: jnp.ndarray):
        self.adj = adj
        self.degrees = degrees

    def __call__(self, key: jax.Array, ids: jnp.ndarray, n_samples: int) -> jnp.ndarray:
        return uniform_neighbor_sample(key, self.adj, self.degrees, ids, n_samples)


sampler_lookup = {
    "uniform_neighbor_sampler": UniformNeighborSampler,
}
