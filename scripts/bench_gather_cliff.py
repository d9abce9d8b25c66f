"""Characterize the gather table-size cliff (round 3, VERDICT #1).

bench_gather_locality.py measured uniform-random row gathers at 13.7 ns/row
from a 65 536-row bf16 table but 23.5-24 ns/row from 131 072+ rows (same
602-dim rows, same 141 312 queries). Locality of the QUERIES doesn't move
the number, so the cliff is a property of the TABLE. This script bisects
which dimension triggers it:

  1. rows sweep   — fixed 1204 B rows, n in 64k..132k: find the row-count
     boundary (2^16 rows? byte threshold crossed along the way?).
  2. bytes sweep  — fixed 232 965 rows, width chosen so total bytes cross
     the candidate 2^27 (134.2 MB) boundary: if per-row cost jumps with
     BYTES not rows, the trigger is table footprint.
  3. split A/B    — the exploit candidates, measured in gather-only form:
     one 602-col gather vs 2×301-col vs 4×151-col column splits (each
     sub-table under the byte threshold; sub-gathers are independent ops
     XLA can overlap), and a 4-way row-range split with masked ids (each
     id gathered from its owning range sub-table, others clipped+zeroed,
     results summed — bitwise the full gather since ranges partition ids).

Method follows bench_gather_locality.py: K iterations inside one jit'd
scan, host-transfer forcing, tables as jit arguments.

    python scripts/bench_gather_cliff.py [--reps 5] [--k 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_QUERIES = 141312  # 512 + 12_800 + 128_000: the batch-512 (25,10) tree
N_HEAD = 232965     # headline graph


def scanned(gather_fn):
    @jax.jit
    def run(table, ids_all):
        def step(carry, ids):
            out = gather_fn(table, ids)
            return carry + jnp.sum(out.astype(jnp.float32)), None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), ids_all)
        return c

    return run


def time_scan(run, args_tuple, reps, k):
    c = run(*args_tuple)
    float(np.asarray(c))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = run(*args_tuple)
        float(np.asarray(c))
        times.append((time.perf_counter() - t0) / k)
    return float(np.median(times))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=30)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    take = scanned(lambda t, i: jnp.take(t, i, axis=0))

    # -- 1. rows sweep at fixed 602-col bf16 rows ---------------------------
    for n in (65536, 65600, 81920, 98304, 110000, 114688, 120000, 131072):
        feat = jnp.asarray(
            rng.standard_normal((n, 602), dtype=np.float32), jnp.bfloat16
        )
        ids = jnp.asarray(rng.integers(0, n, size=(args.k, N_QUERIES)), jnp.int32)
        sec = time_scan(take, (feat, ids), args.reps, args.k)
        emit(cell="rows", n_table=n, width=602, mbytes=round(n * 1204 / 2**20, 1),
             ns_per_row=round(sec / N_QUERIES * 1e9, 3))
        del feat, ids

    # -- 2. bytes sweep at fixed headline row count -------------------------
    ids = jnp.asarray(rng.integers(0, N_HEAD, size=(args.k, N_QUERIES)), jnp.int32)
    for w in (64, 128, 150, 256, 288, 301, 512, 602):
        feat = jnp.asarray(
            rng.standard_normal((N_HEAD, w), dtype=np.float32), jnp.bfloat16
        )
        sec = time_scan(take, (feat, ids), args.reps, args.k)
        emit(cell="bytes", n_table=N_HEAD, width=w,
             mbytes=round(N_HEAD * w * 2 / 2**20, 1),
             ns_per_row=round(sec / N_QUERIES * 1e9, 3))
        del feat

    # -- 3. exploit candidates ----------------------------------------------
    feat = jnp.asarray(
        rng.standard_normal((N_HEAD, 602), dtype=np.float32), jnp.bfloat16
    )

    def colsplit(n_split):
        w = 602 // n_split
        widths = [w] * (n_split - 1) + [602 - w * (n_split - 1)]
        offs = np.cumsum([0] + widths[:-1])

        @jax.jit
        def run(table, ids_all):
            subs = [
                jax.lax.slice_in_dim(table, int(o), int(o + ww), axis=1)
                for o, ww in zip(offs, widths)
            ]

            def step(carry, ids):
                outs = [jnp.take(s, ids, axis=0) for s in subs]
                return carry + sum(jnp.sum(o.astype(jnp.float32)) for o in outs), None

            c, _ = jax.lax.scan(step, jnp.float32(0.0), ids_all)
            return c

        return run

    def colsplit_pre(n_split):
        """Sub-tables as separate jit ARGUMENTS (pre-split on host — the
        product path would store them split)."""
        w = 602 // n_split
        widths = [w] * (n_split - 1) + [602 - w * (n_split - 1)]

        @jax.jit
        def run(*args_):
            subs, ids_all = args_[:-1], args_[-1]

            def step(carry, ids):
                outs = [jnp.take(s, ids, axis=0) for s in subs]
                return carry + sum(jnp.sum(o.astype(jnp.float32)) for o in outs), None

            c, _ = jax.lax.scan(step, jnp.float32(0.0), ids_all)
            return c

        return run, widths

    def rowsplit(n_split):
        m = -(-N_HEAD // n_split)

        @jax.jit
        def run(table, ids_all):
            # each sub-table is an equal-size m-row slice; the LAST slice is
            # shifted back to stay in bounds. Ownership masks use the TRUE
            # disjoint ranges [j·m, (j+1)·m) so every id is answered exactly
            # once even where the last slice overlaps its neighbor.
            slice_lo = [min(j * m, N_HEAD - m) for j in range(n_split)]
            subs = [
                jax.lax.slice_in_dim(table, lo, lo + m, axis=0)
                for lo in slice_lo
            ]

            def step(carry, ids):
                acc = jnp.zeros((ids.shape[0], 602), jnp.float32)
                for j, s in enumerate(subs):
                    lo_true, hi_true = j * m, min((j + 1) * m, N_HEAD)
                    local = jnp.clip(ids - slice_lo[j], 0, m - 1)
                    rows = jnp.take(s, local, axis=0)
                    own = (ids >= lo_true) & (ids < hi_true)
                    acc = acc + jnp.where(own[:, None], rows, 0).astype(jnp.float32)
                return carry + jnp.sum(acc), None

            c, _ = jax.lax.scan(step, jnp.float32(0.0), ids_all)
            return c

        return run

    sec = time_scan(take, (feat, ids), args.reps, args.k)
    emit(cell="exploit", method="one_gather_602",
         ns_per_row=round(sec / N_QUERIES * 1e9, 3))
    for ns_ in (2, 4):
        sec = time_scan(colsplit(ns_), (feat, ids), args.reps, args.k)
        emit(cell="exploit", method=f"colsplit{ns_}_sliced",
             ns_per_row=round(sec / N_QUERIES * 1e9, 3))
        run, widths = colsplit_pre(ns_)
        host = np.asarray(feat)
        offs = np.cumsum([0] + widths[:-1])
        subs = [
            jnp.asarray(host[:, o : o + w]) for o, w in zip(offs, widths)
        ]
        sec = time_scan(run, tuple(subs) + (ids,), args.reps, args.k)
        emit(cell="exploit", method=f"colsplit{ns_}_prestored",
             ns_per_row=round(sec / N_QUERIES * 1e9, 3))
        sec = time_scan(rowsplit(ns_), (feat, ids), args.reps, args.k)
        emit(cell="exploit", method=f"rowsplit{ns_}_masked",
             ns_per_row=round(sec / N_QUERIES * 1e9, 3))
    return 0


if __name__ == "__main__":
    sys.exit(main())
