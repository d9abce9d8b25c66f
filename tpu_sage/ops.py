"""Shared device-side primitives.

``row_gather`` is the framework-wide spelling of ``table[ids]`` on the hot
path. Measured on the axon TPU backend (scripts/bench_gather_form.py,
232 965-node Reddit-shaped bench, batch 512, fanout (25, 10), bf16,
200-step scans, median-of-3):

  table[ids]  (plain)                              4.38 ms/step
  table[ids[None]][0]  (leading unit dim)          4.33
  table[clip(ids)]  (clip only)                    4.32
  clip + unit dim                                  4.34
  clip + where(in-bounds, rows, 0)  (THIS)         3.75   ← 14% whole step
  full dist_gather form (unit dim + clip + mask)   3.74

The post-gather select is what flips XLA's TPU lowering: it forces the
gathered rows to materialize as a standalone fused gather kernel instead of
being fused into the consumer (matmul / one-hot select), which serializes
into a slower latency-bound emitter. ``tpu_sage.dist.halo`` discovered the
fast form independently (its shard-local gathers need the clip + mask for
ownership semantics anyway); this lifts it to the single-device path.

For in-bounds ids the result — and its gradient — is element-identical to
``table[ids]``: clip is a no-op, the mask is all-true, and the backward is
the same scatter-add at the same indices (the where multiplies the cotangent
by 1). Out-of-bounds ids return zero rows instead of XLA's clamp semantics;
nothing in the framework relies on OOB clamping.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_sage import overrides


def row_gather(table: jnp.ndarray, ids: jnp.ndarray, form: str | None = None) -> jnp.ndarray:
    """``table[ids]`` with an explicit choice of TPU lowering (see module doc).

    ``form`` picks the emitter the consumer measured fastest with:

    - ``"plain"`` (default since round 3): ``table[ids]`` untouched, letting
      XLA fuse the gather into the consumer and split into overlapping
      chunks (``row_gather_chunked``). At 8+ gather chunks (round-3
      defaults), plain-everywhere measures 61.46M edges/s on the mean headline
      vs 59.70M masked-everywhere (same session, bench_logs/r3_form*) — the
      chunk overlap now beats the defusion trick for every aggregator.
    - ``"masked"``: clip + post-gather select. The select forces the
      gathered rows to materialize as a standalone fused-gather kernel —
      the round-2 winner for the mean path at 4 unchunked masked levels
      (3.10 vs 3.65 ms/step then); kept for A/B and for OOB-zero-fill
      semantics where a caller wants them.

    ``ids`` may have any shape; trailing table dims broadcast. Under
    ``"masked"``, OOB ids yield zero rows (never produced by the samplers —
    adjacency entries are valid node ids by construction, graph_data.py);
    ``"plain"`` keeps XLA's clamp semantics. Tables that know how to gather
    themselves (``QuantizedFeats``: mask the int8 rows, dequantize after)
    are dispatched to their own ``row_gather`` method.

    ``form`` normally arrives from the model's config-driven policy
    (``TrainConfig.gather_form``, nn/model.py::encode);
    ``TPU_SAGE_GATHER_FORM`` remains a whole-program A/B override
    (tpu_sage.overrides).
    """
    own = getattr(table, "row_gather", None)
    if own is not None:
        return own(ids, form=form)
    form = overrides.gather_form(form) or "plain"
    if form == "plain":
        return table[ids]
    m = table.shape[0]
    rows = table[jnp.clip(ids, 0, m - 1)]
    ok = (ids >= 0) & (ids < m)
    return jnp.where(ok.reshape(ok.shape + (1,) * (rows.ndim - ok.ndim)), rows, 0)


# Chunked gathers: XLA issues gather descriptors serially PER OP but runs
# independent gather ops concurrently, so splitting one big gather into
# chunks overlaps the descriptor streams: the 141k-row Reddit feature gather
# measures 3.06 -> 2.00 ms at 4 chunks (scripts/bench_gather_split.py).
# Whole-step the round-3 sweep (at the plain-form default) put the optimum
# at 10 streams: 62.3M edges/s vs 61.8 (8) / 61.4 (20) / 49.2 (25) /
# 42.4 (5); divisors of the 12 800 deepest-level roots win (3/6/12 regress).
# The chunk count is config-driven (TrainConfig.gather_chunks, default 10);
# TPU_SAGE_GATHER_CHUNKS=1 disables for whole-program A/B (tpu_sage.overrides).
DEFAULT_CHUNKS = 10
_CHUNK_MIN_ROWS = 4096  # below this the extra ops cost more than they overlap


def snap_chunks(n_chunks: int, n_units: int) -> int:
    """Largest k ≤ ``n_chunks`` that divides ``n_units`` (falling back to 1).

    Ragged tail chunks serialize and cost far more than a slightly lower
    stream count: on the 12 800-root supervised tree, 3/6/12 chunks (ragged)
    measure 54.5/46.2/57.1M edges/s while 8/10 (clean) measure 61.8/62.3M;
    the unsupervised tree's 6 144 roots regressed 44.5 → 29.7M when the
    fixed default 10 left a ragged tail (round-3 logs). Snapping keeps every
    chunk equal-sized for whatever tree shape the caller brings."""
    for k in range(min(n_chunks, n_units), 1, -1):
        if n_units % k == 0:
            return k
    return 1


def row_gather_chunked(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    form: str | None = None,
    n_chunks: int = DEFAULT_CHUNKS,
) -> jnp.ndarray:
    """``row_gather`` split into independent chunk gathers for overlap.

    Chunks are contiguous static slices of a flat ``ids`` vector; results
    concatenate back — element-identical to the single gather. Falls back to
    one gather for small/non-flat ``ids`` (the overlap only pays above
    ~4k rows) and when chunking is disabled.
    """
    n_chunks = overrides.gather_chunks(n_chunks)
    n = ids.shape[0] if ids.ndim == 1 else 0
    if n_chunks <= 1 or n < _CHUNK_MIN_ROWS:
        return row_gather(table, ids, form=form)
    n_chunks = snap_chunks(n_chunks, n)
    if n_chunks <= 1:
        return row_gather(table, ids, form=form)
    c = n // n_chunks
    parts = [
        row_gather(table, ids[j * c : (j + 1) * c], form=form)
        for j in range(n_chunks)
    ]
    return jnp.concatenate(parts, axis=0)


def row_gather_fanout_mean(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    fanout: int,
    form: str | None = None,
    n_chunks: int = DEFAULT_CHUNKS,
    int8_summean: bool = True,
) -> jnp.ndarray:
    """Gather flat ``ids`` and mean over trailing ``fanout`` groups, chunked.

    Equals ``mean(row_gather(table, ids).reshape(-1, fanout, D), axis=1)``
    with the gather split into independent root-aligned chunks and the mean
    taken PER CHUNK, so the concat re-materializes only the ``(n_roots, D)``
    means instead of the raw rows — this is what lets the MASKED (mean-path)
    gather keep the descriptor-stream overlap that chunk+concat of raw rows
    forfeits (scripts/bench_gather_mean.py: one.masked.mm 2.76 →
    chunk4.masked.mm 2.14 ms on the int8 level-2 stage). Only valid when the
    rows' sole consumer is the fanout mean — i.e. the DEEPEST tree level
    under the mean aggregator with an ids-blind linear prep.
    """
    n_chunks = overrides.gather_chunks(n_chunks)
    n = ids.shape[0]
    n_roots = n // fanout
    # Tables with their own gather+mean (QuantizedFeats: exact int32 sum of
    # the raw int8 rows, ONE dequant multiply per mean instead of per row)
    # summarize each chunk themselves. ``int8_summean=False`` (config field /
    # TPU_SAGE_INT8_SUMMEAN=0) restores dequantize-then-mean for A/B.
    own = getattr(table, "fanout_mean", None)
    if own is not None and not overrides.int8_summean(int8_summean):
        own = None

    def gather_mean(sub_ids: jnp.ndarray, nb: int) -> jnp.ndarray:
        if own is not None:
            return own(sub_ids, nb, fanout, form=form)
        rows = row_gather(table, sub_ids, form=form)
        return jnp.mean(rows.reshape(nb, fanout, rows.shape[-1]), axis=1)

    if n_chunks <= 1 or n < _CHUNK_MIN_ROWS or n_roots < n_chunks:
        return gather_mean(ids, n_roots)
    n_chunks = snap_chunks(n_chunks, n_roots)
    if n_chunks <= 1:
        return gather_mean(ids, n_roots)
    cb = n_roots // n_chunks  # roots per chunk (exact by construction)
    parts = [
        gather_mean(ids[j * cb * fanout : (j + 1) * cb * fanout], cb)
        for j in range(n_chunks)
    ]
    return jnp.concatenate(parts, axis=0)
