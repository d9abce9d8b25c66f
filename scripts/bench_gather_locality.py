"""Gather cost vs table size and query locality (round-2b follow-up).

SCALING_r02's matched-shape runs exposed that the SAME per-step work costs
3.44 ms/step against a 65 536-node graph but 4.31 ms/step against the
232 965-node headline graph — i.e. the random-row gather is not
table-size-independent: locality (how far apart the touched rows sit in
HBM) moves the per-row cost. This script isolates that:

  1. table-size sweep  — identical uniform queries against 65k..466k-row
     feature tables (602-dim bf16).
  2. locality sweep    — fixed 233k table; uniform vs pre-sorted vs
     windowed vs block-local query id distributions.
  3. sort→gather→project→unsort composite — the candidate optimization:
     sort ids (better HBM locality), gather wide 602 B rows in sorted
     order, apply the first-layer projection (602→128) while sorted
     (row-wise op commutes with the permutation), un-permute only the
     narrow 256 B projected rows.

All gathers run K iterations inside one jit'd scan (axon's flat ~26 ms
dispatch tax would otherwise swamp the signal); every timed unit is forced
with a host transfer (block_until_ready alone can lie on this backend).
Tables are jit arguments, never closure constants (280 MB inlined
constants exceed the axon remote-compile request limit).

    python scripts/bench_gather_locality.py [--reps 5] [--k 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# (sys.path, not PYTHONPATH: the env var interferes with axon PJRT plugin
# discovery at interpreter start)

import jax
import jax.numpy as jnp
import numpy as np

FEAT_DIM = 602
N_QUERIES = 141312  # 512 + 12_800 + 128_000: the batch-512 (25,10) tree
PROJ_DIM = 128


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
    float(np.asarray(c))  # force (axon: block_until_ready can lie)
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

    # -- 1. table-size sweep ----------------------------------------------
    for n in (65536, 131072, 232965, 465930):
        feat = jnp.asarray(
            rng.standard_normal((n, FEAT_DIM), dtype=np.float32), jnp.bfloat16
        )
        ids = jnp.asarray(
            rng.integers(0, n, size=(args.k, N_QUERIES)), jnp.int32
        )
        sec = time_scan(take, (feat, ids), args.reps, args.k)
        emit(cell="table_size", n_table=n, dist="uniform",
             ms_per_call=round(sec * 1e3, 4),
             ns_per_row=round(sec / N_QUERIES * 1e9, 3))
        del feat, ids

    # -- 2. locality sweep at the headline size ---------------------------
    n = 232965
    feat = jnp.asarray(
        rng.standard_normal((n, FEAT_DIM), dtype=np.float32), jnp.bfloat16
    )
    dists = {}
    dists["uniform"] = rng.integers(0, n, size=(args.k, N_QUERIES))
    dists["sorted"] = np.sort(dists["uniform"], axis=1)
    starts = rng.integers(0, n - 65536, size=(args.k, 1))
    dists["window64k"] = starts + rng.integers(
        0, 65536, size=(args.k, N_QUERIES)
    )
    # block-local: queries land in 512 random 4k blocks (a clustered graph
    # ordering makes sampled neighborhoods look like this)
    b_starts = rng.integers(0, n - 4096, size=(args.k, 512))
    b_pick = rng.integers(0, 512, size=(args.k, N_QUERIES))
    dists["block4k"] = np.take_along_axis(
        b_starts, b_pick, axis=1
    ) + rng.integers(0, 4096, size=(args.k, N_QUERIES))

    for name, ids_np in dists.items():
        ids = jnp.asarray(ids_np, jnp.int32)
        sec = time_scan(take, (feat, ids), args.reps, args.k)
        emit(cell="locality", n_table=n, dist=name,
             ms_per_call=round(sec * 1e3, 4),
             ns_per_row=round(sec / N_QUERIES * 1e9, 3))

    # -- 3. sort→gather→project→unsort vs gather→project ------------------
    w = jnp.asarray(
        rng.standard_normal((FEAT_DIM, PROJ_DIM), dtype=np.float32),
        jnp.bfloat16,
    )
    ids = jnp.asarray(dists["uniform"], jnp.int32)

    @jax.jit
    def plain(table, w, ids_all):
        def step(carry, ids):
            proj = jnp.take(table, ids, axis=0) @ w
            return carry + jnp.sum(proj.astype(jnp.float32)), None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), ids_all)
        return c

    @jax.jit
    def sorted_composite(table, w, ids_all):
        def step(carry, ids):
            order = jnp.argsort(ids)
            proj = jnp.take(table, ids[order], axis=0) @ w
            inv = jnp.argsort(order)
            out = jnp.take(proj, inv, axis=0)
            return carry + jnp.sum(out.astype(jnp.float32)), None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), ids_all)
        return c

    for name, fn in (("gather_project", plain),
                     ("sort_gather_project_unsort", sorted_composite)):
        sec = time_scan(fn, (feat, w, ids), args.reps, args.k)
        emit(cell="composite", n_table=n, method=name,
             ms_per_call=round(sec * 1e3, 4))
    return 0


if __name__ == "__main__":
    sys.exit(main())
