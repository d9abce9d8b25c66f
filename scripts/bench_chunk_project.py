"""Per-chunk PROJECTION of the fused fanout-means (L2-stage A/B).

The shipped deepest-level path is ``concat([gather+mean per chunk]) @ W``
(ops.row_gather_fanout_mean feeding fc_neigh): the concat is a barrier —
the projection waits for the SLOWEST chunk's gather. Projecting per chunk
(``concat([gather+mean @ W per chunk])``) makes each chunk's
gather->mean->matmul chain independent, at the cost of 10 small (cb, 602)x
(602, 128) matmuls instead of one (12800, 602) one. Whether the removed
barrier beats the lost matmul efficiency is an empirical question — this
measures it at the headline L2 shapes.

Variants (K-iter in-scan, ms per call):
  concat_mm.<form>.<chunks>   current: concat means, one projection
  mm_concat.<form>.<chunks>   proposed: project per chunk, concat outputs

    python scripts/bench_chunk_project.py [--reps 3] [--k 100]
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
B, FANOUT = 12800, 10
N_QUERIES = B * FANOUT


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k", type=int, default=100)
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    from tpu_sage.ops import row_gather

    feat = jnp.asarray(
        rng.standard_normal((N_TABLE, FEAT_DIM), dtype=np.float32), jnp.bfloat16
    )
    ids_all = jnp.asarray(
        rng.integers(0, N_TABLE, size=(args.k, N_QUERIES)), jnp.int32
    )
    w = jnp.asarray(rng.standard_normal((FEAT_DIM, 128)) * 0.05, jnp.bfloat16)

    def gmean(table, ids, nb, form):
        rows = row_gather(table, ids, form=form)
        return jnp.mean(rows.reshape(nb, FANOUT, -1), axis=1)

    def make(n_chunks, form, per_chunk_mm):
        cb = B // n_chunks

        # table/weights/ids are ARGUMENTS — jit-captured arrays are embedded
        # in the axon remote-compile request (rejects >~200 MB with HTTP 413)
        @jax.jit
        def run(table, proj, ids_scan):
            def step(tot, ids):
                parts = []
                for j in range(n_chunks):
                    m = gmean(table,
                              ids[j * cb * FANOUT : (j + 1) * cb * FANOUT],
                              cb, form)
                    if per_chunk_mm:
                        m = jnp.dot(m.astype(jnp.bfloat16), proj)
                    parts.append(m)
                out = jnp.concatenate(parts, axis=0)
                if not per_chunk_mm:
                    out = jnp.dot(out.astype(jnp.bfloat16), proj)
                return tot + jnp.sum(out.astype(jnp.float32)), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), ids_scan)
            return out

        return run

    for form in ("plain", "masked"):
        for n_chunks in (10, 8):
            for per_chunk_mm in (False, True):
                run = make(n_chunks, form, per_chunk_mm)
                out = run(feat, w, ids_all)
                float(np.asarray(out))
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    float(np.asarray(run(feat, w, ids_all)))
                    ts.append((time.perf_counter() - t0) * 1e3 / args.k)
                name = ("mm_concat" if per_chunk_mm else "concat_mm")
                print(json.dumps({
                    "variant": f"{name}.{form}.{n_chunks}",
                    "ms_per_call": round(float(np.median(ts)), 4),
                }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
