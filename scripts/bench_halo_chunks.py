"""halo_chunks sweep at the HEADLINE graph size (VERDICT round-3 #1).

Round 3 measured the partitioned path at +62% over replicated at the
232,965-node graph (RESULTS.md round-3 §8: 3.758 vs 2.318 ms/step) and
identified the unchunked shard-local answering gathers inside the halo
exchange as the lever; ``TrainConfig.halo_chunks`` implements the chunked
exchange (bitwise-tested) but shipped default-off because the tunnel hung
before an on-chip number could be taken. This script takes that number:
partitioned-exact ms/step across halo_chunks values, bf16 and int8 shards,
plus the replicated baseline at identical shapes.

Run on the real chip (default env):  python scripts/bench_halo_chunks.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nodes", type=int, default=232965)  # Reddit-scale
    ap.add_argument("--feat-dim", type=int, default=602)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--chunks", default="1,2,4,8,10,16,20")
    args = ap.parse_args(argv)
    fanouts = (25, 10)

    from scripts.bench_halo import time_partitioned, time_replicated

    print(json.dumps({"platform": jax.devices()[0].platform,
                      "n_devices": len(jax.devices()),
                      "nodes": args.nodes, "steps": args.steps}), flush=True)

    def run(fn, label, **kw):
        times = []
        for _ in range(args.repeats):
            out = fn(**kw)
            times.append(out[0] if isinstance(out, tuple) else out)
        print(json.dumps({
            "mode": label,
            "ms_per_step_median": round(sorted(times)[len(times) // 2], 3),
            "ms_per_step_all": [round(t, 3) for t in times],
        }), flush=True)

    run(time_replicated, "replicated", n_nodes=args.nodes,
        feat_dim=args.feat_dim, batch_size=args.batch_size, steps=args.steps,
        fanouts=fanouts)
    for int8 in (False, True):
        for k in (int(c) for c in args.chunks.split(",")):
            os.environ["BENCH_HALO_CHUNKS"] = str(k)
            run(time_partitioned,
                f"partitioned_exact_chunks{k}" + ("_int8" if int8 else ""),
                halo="exact", n_nodes=args.nodes, feat_dim=args.feat_dim,
                batch_size=args.batch_size, steps=args.steps, fanouts=fanouts,
                feature_int8=int8)


if __name__ == "__main__":
    main()
