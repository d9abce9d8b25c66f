"""Microbenchmark: Pallas DMA row-gather vs XLA gather, measured in-program.

Measures the gather shapes on the bench critical path (RESULTS.md
"Efficiency analysis"): hop-1 adjacency (512 queries x 128 int32), hop-2
adjacency (12.8k x 128 int32), and the feature gather (141.3k x 602 bf16)
against Reddit-shaped tables. A single dispatched call costs ~1.45 ms on
axon regardless of method or size (tunnel dispatch overhead), so each
method is embedded in a K-iteration ``lax.scan`` — the same shape as the
training epoch loop — and the per-iteration time is what matters.

Each scan iteration gathers a fresh id slice and accumulates jnp.sum(out)
(prevents the gather from being narrowed away; identical cost across
methods). Tables are jit arguments, never closure constants (a 280 MB
inlined constant exceeds the axon remote-compile request limit).

Prints one JSON line per (shape, method).

    python scripts/bench_gather.py [--reps 5] [--k 50]
"""

import argparse
import functools
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

from tpu_sage.kernels.gather import gather_rows

N_NODES = 232965
FEAT_DIM = 602
MAX_DEGREE = 128


def scanned(gather_fn):
    @jax.jit
    def run(table, ids_all):
        def step(carry, ids):
            out = gather_fn(table, ids)
            return carry + jnp.sum(out.astype(jnp.float32)), None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), ids_all)
        return c

    return run


def time_scan(run, table, ids_all, reps, k):
    c = run(table, ids_all)
    float(np.asarray(c))  # force (axon: block_until_ready can lie)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = run(table, ids_all)
        float(np.asarray(c))
        times.append((time.perf_counter() - t0) / k)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--blocks", type=str, default="64,128,256")
    args = ap.parse_args()
    blocks = [int(b) for b in args.blocks.split(",")]

    rng = np.random.default_rng(0)
    feat = jnp.asarray(
        rng.standard_normal((N_NODES, FEAT_DIM), dtype=np.float32),
        jnp.bfloat16,
    )
    adj = jnp.asarray(
        rng.integers(0, N_NODES, size=(N_NODES, MAX_DEGREE)), jnp.int32
    )

    cases = [
        ("adj_hop1", adj, 512),
        ("adj_hop2", adj, 12800),
        ("feat_small", feat, 12800),
        ("feat_tree", feat, 141312),
    ]

    for name, table, n_q in cases:
        ids_all = jnp.asarray(
            rng.integers(0, N_NODES, size=(args.k, n_q)), jnp.int32
        )
        row_bytes = int(table.shape[1] * table.dtype.itemsize)
        bytes_moved = n_q * row_bytes

        run = {"xla_take": lambda t, i: jnp.take(t, i, axis=0)}
        for bq in blocks:
            run[f"pallas_block{bq}"] = functools.partial(gather_rows, block_q=bq)

        for mname, fn in run.items():
            try:
                sec = time_scan(scanned(fn), table, ids_all, args.reps, args.k)
                print(json.dumps({
                    "case": name, "method": mname, "n_queries": n_q,
                    "row_bytes": row_bytes,
                    "ms_per_call": round(sec * 1e3, 4),
                    "gbps": round(bytes_moved / sec / 1e9, 2),
                }), flush=True)
            except Exception as e:  # noqa: BLE001 — record and continue
                print(json.dumps({
                    "case": name, "method": mname, "n_queries": n_q,
                    "error": repr(e)[:200],
                }), flush=True)


if __name__ == "__main__":
    main()
