"""Mean-path L2 stage: can the fanout-mean fuse into chunked gathers?

The headline step's dominant cost is the level-2 feature gather (128 000
rows -> (12800, 10, 602) -> mean over fanout). Chunked gathers overlap
descriptor streams (bench_gather_split: 3.06 -> 2.00 ms for the raw
gather) but chunk+concat of the RAW rows regressed the real step 36%
(the 154 MB concat forfeits the masked defusion win). Here the mean is
taken PER CHUNK, so the concat is (12800, 602) = 15 MB — testing whether
gather->reduce fusion keeps the overlap win without the concat tax.

Variants (each K-iter in-scan, forced by host transfer, ms per call):
  one.<form>      one gather -> reshape -> mean
  chunk4.<form>   4x [chunk gather -> reshape -> mean] -> concat
  *.mm            same followed by a (602, 128) projection matmul
                  (mimics the first-layer fc_neigh consumer)

    python scripts/bench_gather_mean.py [--reps 3] [--k 100] [--int8]
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
B, FANOUT = 12800, 10  # level-1 roots x level-2 fanout
N_QUERIES = B * FANOUT


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    from tpu_sage.ops import row_gather

    if args.int8:
        from tpu_sage.data.quantize import quantize_feats

        feat = quantize_feats(
            rng.standard_normal((N_TABLE, FEAT_DIM)).astype(np.float32)
        )
    else:
        feat = jnp.asarray(
            rng.standard_normal((N_TABLE, FEAT_DIM), dtype=np.float32), jnp.bfloat16
        )
    ids_all = jnp.asarray(
        rng.integers(0, N_TABLE, size=(args.k, N_QUERIES)), jnp.int32
    )
    w = jnp.asarray(rng.standard_normal((FEAT_DIM, 128)) * 0.05, jnp.bfloat16)

    def gmean(gf, ids, nb):  # gather nb*FANOUT rows -> (nb, FEAT_DIM) mean
        rows = gf(ids)
        return jnp.mean(rows.reshape(nb, FANOUT, -1), axis=1)

    def make(n_chunks, form, matmul):
        cb = B // n_chunks  # chunk along the roots axis

        # NB: table/weights/ids must be ARGUMENTS — jit-captured arrays are
        # embedded in the axon remote-compile request, which rejects >~200 MB
        # bodies with HTTP 413.
        @jax.jit
        def run(table, proj, ids_scan):
            def step(tot, ids):
                if n_chunks == 1:
                    m = gmean(lambda i: row_gather(table, i, form=form), ids, B)
                else:
                    parts = [
                        gmean(
                            lambda i: row_gather(table, i, form=form),
                            ids[j * cb * FANOUT : (j + 1) * cb * FANOUT],
                            cb,
                        )
                        for j in range(n_chunks)
                    ]
                    m = jnp.concatenate(parts, axis=0)
                if matmul:
                    m = jnp.dot(m.astype(jnp.bfloat16), proj)
                return tot + jnp.sum(m.astype(jnp.float32)), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), ids_scan)
            return out

        return run

    for matmul in (False, True):
        for form in ("masked", "plain"):
            for n_chunks in (1, 4):
                run = make(n_chunks, form, matmul)
                out = run(feat, w, ids_all)
                float(np.asarray(out))
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    float(np.asarray(run(feat, w, ids_all)))
                    ts.append((time.perf_counter() - t0) * 1e3 / args.k)
                name = f"{'chunk4' if n_chunks == 4 else 'one'}.{form}" + (
                    ".mm" if matmul else ""
                )
                print(
                    json.dumps(
                        {
                            "variant": name,
                            "int8": bool(args.int8),
                            "ms_per_call": round(float(np.median(ts)), 4),
                        }
                    ),
                    flush=True,
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
