"""Pallas-vs-XLA kernel measurement on the real chip (VERDICT round-1 #9).

Runs only when ``tpu_sage.kernels.probe()`` passes (the axon backend has
hung Pallas compiles intermittently — the probe is subprocess-isolated).
Two hot ops at the Reddit-bench shapes, each timed inside a K-iteration
``lax.scan`` (amortizes the flat ~26 ms dispatch tax — STATUS.md cost
model), median-of-3:

- ``select_columns``: one-hot compare-select (XLA) vs the VMEM-tiled Pallas
  kernel, hop-2 shape (12800, 128) rows × (12800, 10) cols int32.
- ``mean_project``: mean-over-fanout + projection, XLA (two ops, fused by
  the compiler) vs the Pallas fused kernel, (12800, 10, 602) bf16 → 128.

Prints JSONL rows; paste the medians into STATUS.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed_scan(fn, args, iters=100, repeats=3):
    """Median ms/call of fn inside a scan (data-independent per-iter inputs
    folded from the carry so XLA can't hoist the body)."""

    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*args, c)
            # fold a scalar of the output back into the carry so iterations
            # are sequenced and nothing is dead-code-eliminated
            return c + out, None

        c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    float(run(args))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(args))
        times.append((time.perf_counter() - t0) * 1e3 / iters)
    return sorted(times)[len(times) // 2], [round(t, 4) for t in times]


def main():
    from tpu_sage import kernels

    plat = jax.devices()[0].platform
    print(json.dumps({"platform": plat}), flush=True)
    interp = plat == "cpu"  # CPU backend only supports interpret mode
    # SKIP_PROBE=1: the caller just probed — the axon window can close within
    # a minute, so don't spend it re-probing (the run stays under timeout)
    if (not interp and os.environ.get("SKIP_PROBE") != "1"
            and not kernels.probe()):
        print(json.dumps({"error": "pallas probe failed"}), flush=True)
        return 1

    from tpu_sage.kernels.select import select_columns_pallas
    from tpu_sage.kernels.mean_project import mean_project
    from tpu_sage.sample.sampler import select_columns

    rng = np.random.default_rng(0)

    # --- select_columns, hop-2 Reddit shape ------------------------------
    B, D, K = 12800, 128, 10
    rows = jnp.asarray(rng.integers(0, 2**20, (B, D)), jnp.int32)
    cols_np = rng.integers(0, D, (B, K)).astype(np.int32)

    def xla_sel(rows, cols, c):
        out = select_columns(rows, (cols + c.astype(jnp.int32)) % D)
        return out.sum().astype(jnp.float32)

    def pl_sel(rows, cols, c):
        out = select_columns_pallas(rows, (cols + c.astype(jnp.int32)) % D,
                                    interpret=interp)
        return out.sum().astype(jnp.float32)

    cols = jnp.asarray(cols_np)
    np.testing.assert_array_equal(
        np.asarray(select_columns(rows, cols)),
        np.asarray(select_columns_pallas(rows, cols, interpret=interp)),
    )
    if not interp:
        med, all_t = timed_scan(xla_sel, (rows, cols))
        print(json.dumps({"op": "select_columns", "impl": "xla",
                          "shape": [B, D, K], "ms": round(med, 4),
                          "all": all_t}), flush=True)
        med, all_t = timed_scan(pl_sel, (rows, cols))
        print(json.dumps({"op": "select_columns", "impl": "pallas",
                          "shape": [B, D, K], "ms": round(med, 4),
                          "all": all_t}), flush=True)

    # --- mean_project, layer-1 Reddit shape ------------------------------
    B2, F, Din, O = 12800, 10, 602, 128
    x = jnp.asarray(rng.normal(size=(B2, F, Din)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(Din, O)) * 0.05, jnp.bfloat16)

    def xla_mp(x, w, c):
        out = jnp.mean(x + c.astype(x.dtype), axis=1) @ w
        return out.sum().astype(jnp.float32)

    def pl_mp(x, w, c):
        out = mean_project(x + c.astype(x.dtype), w, 128, interp)
        return out.sum().astype(jnp.float32)

    np.testing.assert_allclose(
        np.asarray(jnp.mean(x, axis=1) @ w, np.float32),
        np.asarray(mean_project(x, w, 128, interp), np.float32),
        rtol=0.1, atol=0.5,  # bf16 reduction-order tolerance
    )
    if interp:
        print(json.dumps({"note": "cpu interpret mode — correctness only"}),
              flush=True)
        return 0
    med, all_t = timed_scan(xla_mp, (x, w))
    print(json.dumps({"op": "mean_project", "impl": "xla",
                      "shape": [B2, F, Din, O], "ms": round(med, 4),
                      "all": all_t}), flush=True)
    med, all_t = timed_scan(pl_mp, (x, w))
    print(json.dumps({"op": "mean_project", "impl": "pallas",
                      "shape": [B2, F, Din, O], "ms": round(med, 4),
                      "all": all_t}), flush=True)

    # --- combined gather+fanout-mean, deepest-level Reddit shape ----------
    # (round-4, VERDICT r3 #8: the one formulation never directly measured —
    # one HBM pass vs the XLA chunked gather + per-chunk mean)
    from tpu_sage.kernels.gather_mean import gather_fanout_mean
    from tpu_sage.ops import row_gather_fanout_mean

    N, F2 = 232965, 10
    table = jnp.asarray(rng.normal(size=(N, Din)), jnp.bfloat16)
    gids_np = rng.integers(0, N, (B2 * F2,)).astype(np.int32)
    gids = jnp.asarray(gids_np)

    def xla_gm(table, gids, c):
        out = row_gather_fanout_mean(
            table, (gids + c.astype(jnp.int32)) % N, F2
        )
        return out.sum().astype(jnp.float32)

    def pl_gm(table, gids, c):
        out = gather_fanout_mean(
            table, (gids + c.astype(jnp.int32)) % N, F2, tile_r=32
        )
        return out.sum().astype(jnp.float32)

    np.testing.assert_allclose(
        np.asarray(row_gather_fanout_mean(table, gids, F2), np.float32),
        np.asarray(gather_fanout_mean(table, gids, F2, tile_r=32), np.float32),
        rtol=0.05, atol=0.05,
    )
    med, all_t = timed_scan(xla_gm, (table, gids), iters=30)
    print(json.dumps({"op": "gather_fanout_mean", "impl": "xla",
                      "shape": [B2, F2, Din], "ms": round(med, 4),
                      "all": all_t}), flush=True)
    for tile_r in (16, 32, 128):
        def pl_gm_t(table, gids, c, tile_r=tile_r):
            out = gather_fanout_mean(
                table, (gids + c.astype(jnp.int32)) % N, F2, tile_r=tile_r
            )
            return out.sum().astype(jnp.float32)

        med, all_t = timed_scan(pl_gm_t, (table, gids), iters=30)
        print(json.dumps({"op": "gather_fanout_mean", "impl": "pallas",
                          "tile_r": tile_r, "ms": round(med, 4),
                          "all": all_t}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
