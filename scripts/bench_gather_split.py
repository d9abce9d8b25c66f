"""Is the gather descriptor rate per-OP or global? Split-gather probe.

The headline step's dominant cost is the 141k-row feature gather
(RESULTS.md step breakdown: 2.36 ms). If XLA issues gather descriptors
serially PER GATHER OP but runs independent ops concurrently (round-1
observation: "independent gathers overlap freely"), splitting one large
gather into N parallel chunk gathers should cut wall time. If the rate
limit is global (HBM controller / scalar core), it won't.

Each variant gathers the same 141 312 rows from the Reddit-shaped bf16
table inside a K-iteration jit'd scan (flat dispatch tax amortized), forced
by host transfer. Variants: one gather; 2/4/8 chunk gathers (contiguous
slices of the id vector — independent ops, results summed); and the same
with the row_gather masked form.

    python scripts/bench_gather_split.py [--reps 5] [--k 50]
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

FEAT_DIM = 602
N_TABLE = 232965
N_QUERIES = 141312


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=50)
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    from tpu_sage.ops import row_gather

    feat = jnp.asarray(
        rng.standard_normal((N_TABLE, FEAT_DIM), dtype=np.float32), jnp.bfloat16
    )
    ids_all = jnp.asarray(
        rng.integers(0, N_TABLE, size=(args.k, N_QUERIES)), jnp.int32
    )

    def make(n_chunks, gf):
        c = N_QUERIES // n_chunks

        @jax.jit
        def run(table, ids_scan):
            def step(carry, ids):
                tot = carry
                for j in range(n_chunks):
                    rows = gf(table, jax.lax.dynamic_slice_in_dim(ids, j * c, c))
                    tot = tot + jnp.sum(rows.astype(jnp.float32))
                return tot, None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), ids_scan)
            return out

        return run

    def timed(run):
        out = run(feat, ids_all)
        float(np.asarray(out))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = run(feat, ids_all)
            float(np.asarray(out))
            ts.append((time.perf_counter() - t0) * 1e3 / args.k)
        return float(np.median(ts))

    plain = lambda t, i: t[i]
    for name, gf in (("plain", plain), ("masked", row_gather)):
        for n_chunks in (1, 2, 4, 8):
            ms = timed(make(n_chunks, gf))
            print(json.dumps({"form": name, "n_chunks": n_chunks,
                              "ms_per_call": round(ms, 4),
                              "ns_per_row": round(ms * 1e6 / N_QUERIES, 3)}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
