"""Probe the modeled capacity envelope on the real chip (VERDICT r4 #6).

Builds a zero-filled GraphStore (values are irrelevant for capacity; zeros
cost no host RNG) at ``--frac`` of the model's predicted max node count for
the given configuration, then runs 3 real training steps (or one exact
full-graph inference pass) and reports wall times + device memory stats
where the backend exposes them. ``--frac 1.15`` past the limit demonstrates
the graceful RESOURCE_EXHAUSTED handling instead of a crash.

    python scripts/bench_capacity.py --feat-dim 602 --max-degree 128 --frac 0.9
    python scripts/bench_capacity.py --mode infer --frac 0.9
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def zero_store(n_nodes, feat_dim, max_degree):
    from tpu_sage.graph.graph_data import GraphStore

    n = int(n_nodes)
    adj = np.zeros((n, max_degree), np.int32)
    deg = np.full(n, max_degree, np.int32)
    folds = {"train": np.arange(0, n, 2, dtype=np.int64),
             "val": np.arange(1, n, 4, dtype=np.int64),
             "test": np.arange(3, n, 4, dtype=np.int64)}
    return GraphStore(
        adj=adj, degrees=deg, train_adj=adj, train_degrees=deg,
        feats=np.zeros((n, feat_dim), np.float32),
        targets=np.zeros(n, np.int64), folds=folds,
        task="classification", n_classes=4,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--feat-dim", type=int, default=602)
    ap.add_argument("--max-degree", type=int, default=128)
    ap.add_argument("--frac", type=float, default=0.9)
    ap.add_argument("--mode", choices=["train", "infer"], default="train")
    ap.add_argument("--product", action="store_true",
                    help="drive the real fit() loop (eval_every_epoch=False, "
                         "1 epoch) instead of raw train_step calls — proves "
                         "the PRODUCT path reaches the measured envelope "
                         "(it holds one feature table + one adjacency since "
                         "the round-5 shared-feats/lazy-eval fixes)")
    ap.add_argument("--csr", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--batch-size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_sage.bench.capacity import CapacityConfig, max_nodes, resident_bytes
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

    cfg = CapacityConfig(
        feat_dim=args.feat_dim, max_degree=args.max_degree,
        avg_degree=args.max_degree,
        feature="int8" if args.int8 else "bfloat16",
        adjacency="csr" if args.csr else "dense", mode=args.mode,
        batch_size=args.batch_size,
    )
    limit = max_nodes(cfg)
    n = int(limit * args.frac)
    print(json.dumps({"modeled_max_nodes": limit, "probe_nodes": n,
                      "modeled_gb": round(resident_bytes(n, cfg) / 1e9, 2),
                      **{k: getattr(args, k) for k in
                         ("feat_dim", "max_degree", "frac", "mode", "csr",
                          "int8")}}), flush=True)

    t0 = time.perf_counter()
    store = zero_store(n, args.feat_dim, args.max_degree)
    problem = NodeProblem(store)
    tc = TrainConfig(batch_size=args.batch_size, n_train_samples=(25, 10),
                     n_val_samples=(25, 10), output_dims=(128, 128),
                     compute_dtype="bfloat16", epochs=1,
                     feature_int8=args.int8)
    model = build_model(tc, problem.n_nodes, problem.n_classes)
    if args.product:
        from tpu_sage.train.trainer import fit

        try:
            t1 = time.perf_counter()
            _, _, hist = fit(problem, tc, eval_every_epoch=False,
                             csr=args.csr,
                             log=lambda rec: print(json.dumps(rec),
                                                   flush=True))
            print(json.dumps({
                "result": "ok", "fit_epoch_s":
                round(time.perf_counter() - t1, 1),
                "ms_per_step": round(1e3 * hist[-1]["elapsed"]
                                     / max(1, n // 2 // args.batch_size), 3),
                "loss_finite": bool(np.isfinite(hist[-1]["train_loss"])),
            }), flush=True)
        except Exception as e:
            msg = str(e)
            kind = ("RESOURCE_EXHAUSTED" if "RESOURCE_EXHAUSTED" in msg
                    or "Out of memory" in msg else "error")
            print(json.dumps({"result": kind, "detail": msg[:300]}),
                  flush=True)
            sys.exit(0 if kind == "RESOURCE_EXHAUSTED" else 1)
        return
    try:
        graph = problem.device_graph(train=True, dtype=jnp.bfloat16,
                                     csr=args.csr, quantize=args.int8)
        print(json.dumps({"built_and_uploaded_s":
                          round(time.perf_counter() - t0, 1)}), flush=True)
        if args.mode == "infer":
            from tpu_sage.nn.full_graph import embed_all_nodes

            trainer = Trainer(model, tc, 1, task=problem.task)
            state = trainer.init_state(graph)
            t1 = time.perf_counter()
            out = embed_all_nodes(model, state.params, graph, chunk=4096)
            out.block_until_ready()
            print(json.dumps({"exact_pass_s":
                              round(time.perf_counter() - t1, 2),
                              "nodes_per_s": round(n / (time.perf_counter() - t1))}),
                  flush=True)
        else:
            trainer = Trainer(model, tc, 1, task=problem.task)
            state = trainer.init_state(graph)
            ids = jnp.zeros((args.batch_size,), jnp.int32)
            tgt = jnp.zeros((args.batch_size,), jnp.int32)
            times = []
            for i in range(4):
                t1 = time.perf_counter()
                state, m = trainer.train_step(state, graph, ids, tgt)
                float(m["loss"])
                times.append(round(1e3 * (time.perf_counter() - t1), 1))
            print(json.dumps({"train_step_ms": times,
                              "loss_finite": bool(np.isfinite(float(m["loss"])))}),
                  flush=True)
        stats = None
        try:
            stats = jax.local_devices()[0].memory_stats()
        except Exception:
            pass
        if stats:
            print(json.dumps({"bytes_in_use": stats.get("bytes_in_use"),
                              "peak_bytes_in_use": stats.get("peak_bytes_in_use")}),
                  flush=True)
        print(json.dumps({"result": "ok"}), flush=True)
    except Exception as e:
        msg = str(e)
        kind = ("RESOURCE_EXHAUSTED" if "RESOURCE_EXHAUSTED" in msg
                or "Out of memory" in msg else "error")
        print(json.dumps({"result": kind, "detail": msg[:300]}), flush=True)
        sys.exit(0 if kind == "RESOURCE_EXHAUSTED" else 1)


if __name__ == "__main__":
    main()
