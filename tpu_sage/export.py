"""Embedding / logits export for serving (full-graph inference).

    python -m tpu_sage.export --problem-path p.h5 --checkpoint model.npz \
        --out embeddings.npy [--logits] [--aggregator-class mean ...]

Loads a trained checkpoint, runs exact layer-wise inference over every node
(tpu_sage.nn.full_graph — no sampling variance), and writes an ``.npy`` the
serving stack can mmap. The model flags must match the training run (or pass
the same ``--config`` preset).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _npz_embedding_rows(path):
    """Row count of the checkpoint's 2-D prep-embedding table, read from the
    ``.npy`` member HEADERS of the npz zip — a transductive checkpoint of a
    multi-million-node graph stores a ~GB embedding table (plus matching
    adam moment tables), and decompressing it just to compare ``shape[0]``
    doubles checkpoint I/O and peak host memory on the export path
    (round-5 review finding). Falls back to ``np.load`` if the archive
    layout is unexpected; returns None when no table matches."""
    import zipfile

    from numpy.lib import format as npf

    try:
        with zipfile.ZipFile(path) as zf:
            for name in zf.namelist():
                key = name[:-4] if name.endswith(".npy") else name
                if "prep" in key and "embedding" in key:
                    with zf.open(name) as f:
                        version = npf.read_magic(f)
                        if version == (1, 0):
                            shape, _, _ = npf.read_array_header_1_0(f)
                        elif version == (2, 0):
                            shape, _, _ = npf.read_array_header_2_0(f)
                        else:  # future .npy format: use the np.load fallback
                            raise ValueError("unknown npy header version")
                    if len(shape) == 2:
                        return int(shape[0])
    except (zipfile.BadZipFile, ValueError, KeyError):
        with np.load(path) as data:
            for k in data.files:
                if "prep" in k and "embedding" in k and data[k].ndim == 2:
                    return int(data[k].shape[0])
    return None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--problem-path")
    src.add_argument("--synthetic", choices=["sbm"])
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint-config", action="store_true",
                    help="take the model config from the checkpoint's own "
                         "__config__ metadata instead of CLI flags — the "
                         "safe spelling for cross-graph inductive inference "
                         "(train on graph A, export a DISJOINT graph B)")
    ap.add_argument("--logits", action="store_true",
                    help="export classifier logits instead of embeddings")
    ap.add_argument("--partitioned", action="store_true",
                    help="node-shard the graph over all visible devices and "
                         "run SHARDED exact inference (halo-gathered "
                         "activations) — for graphs too big for one chip")
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--out-dtype", default="float32",
                    choices=["float32", "float16"],
                    help="dtype of the exported .npy. float16 halves both "
                         "the device->host fetch (the end-to-end bottleneck "
                         "at scale: the f32 embeddings fetch measured 18.3 s "
                         "at Reddit size through this backend — RESULTS r5 "
                         "§8; cast happens ON DEVICE) and the artifact. "
                         "Embeddings are L2-normalized and logits "
                         "pre-softmax O(10) — both safely inside f16 range")
    # multi-host bring-up (SURVEY.md §5.8): pass all three on every process;
    # each contributes its local shards and process 0 writes the output
    ap.add_argument("--coordinator", default=None,
                    help="jax.distributed coordinator address host:port")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    # model flags (must match training) when no --config given
    ap.add_argument("--aggregator-class", default="mean")
    ap.add_argument("--prep-class", default="identity")
    ap.add_argument("--n-train-samples", default="25,10")
    ap.add_argument("--n-val-samples", default="25,10")
    ap.add_argument("--output-dims", default="128,128")
    ap.add_argument("--synthetic-nodes", type=int, default=2708)
    ap.add_argument("--synthetic-classes", type=int, default=7)
    ap.add_argument("--synthetic-feat-dim", type=int, default=64)
    ap.add_argument("--seed", type=int, default=123)
    args = ap.parse_args(argv)

    from tpu_sage.dist.mesh import init_multihost

    # must run before the first jax backend touch on multi-process runs
    init_multihost(args.coordinator, args.num_processes, args.process_id)

    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.nn.full_graph import embed_all_nodes
    from tpu_sage.train.checkpoint import load_checkpoint
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

    if args.checkpoint_config:
        from tpu_sage.train.checkpoint import read_checkpoint_config

        stored = read_checkpoint_config(args.checkpoint)
        if stored is None:
            raise SystemExit(
                f"--checkpoint-config: {args.checkpoint} carries no "
                "__config__ metadata (written by every checkpoint since "
                "round 3) — pass --config or the model flags instead"
            )
        config = TrainConfig.from_dict(stored, origin=args.checkpoint)
    elif args.config:
        config = TrainConfig.from_json(args.config)
    else:
        ints = lambda s: tuple(int(x) for x in s.split(","))
        config = TrainConfig(
            aggregator_class=args.aggregator_class,
            prep_class=args.prep_class,
            n_train_samples=ints(args.n_train_samples),
            n_val_samples=ints(args.n_val_samples),
            output_dims=ints(args.output_dims),
            seed=args.seed,
        )

    if args.synthetic:
        from tpu_sage.data.synthetic import sbm_problem

        problem = sbm_problem(n_nodes=args.synthetic_nodes,
                              n_classes=args.synthetic_classes,
                              feat_dim=args.synthetic_feat_dim,
                              seed=args.seed)
    else:
        problem = NodeProblem.from_h5(args.problem_path)

    if config.prep_class == "node_embedding":
        # Transductive prep: the learned (n_nodes, embedding_dim) table is
        # keyed by TRAINING-graph node id. Exporting a different graph with
        # it would either shape-mismatch or silently look up meaningless
        # rows — fail with the inductive story instead (identity/linear
        # preps are graph-size-independent and transfer; SURVEY.md §0.1).
        import os

        if not os.path.exists(args.checkpoint):
            # keep the clean missing-file message on this path too (the
            # guard below np.load()s before load_checkpoint's own check)
            raise SystemExit(f"error: checkpoint not found: {args.checkpoint!r}")
        emb_rows = _npz_embedding_rows(args.checkpoint)
        if emb_rows is not None and emb_rows != problem.n_nodes:
            raise SystemExit(
                f"prep_class=node_embedding is TRANSDUCTIVE: the checkpoint's "
                f"embedding table covers {emb_rows} training-graph nodes but "
                f"the target graph has {problem.n_nodes}. Cross-graph "
                f"inference needs a graph-size-independent prep — retrain "
                f"with --prep-class identity or linear."
            )

    model = build_model(config, problem.n_nodes, problem.n_classes)
    if args.partitioned:
        # the flag exists for graphs that do NOT fit one chip, so the
        # parameter template is built from tiny dummies (forward_gathered
        # needs no device-resident feature table) and the only full-graph
        # upload is the node-SHARDED one
        import jax
        import jax.numpy as jnp

        from tpu_sage.dist.mesh import make_mesh
        from tpu_sage.dist.partition import shard_graph
        from tpu_sage.nn.full_graph import embed_all_nodes_partitioned
        from tpu_sage.train.trainer import TrainState, build_optimizer

        levels = [jnp.zeros((1,), jnp.int32)]
        feats = [jnp.zeros((1, problem.feats_dim))]
        for f in model.fanouts(train=True):
            levels.append(jnp.zeros((levels[-1].shape[0] * f,), jnp.int32))
            feats.append(jnp.zeros((levels[-1].shape[0], problem.feats_dim)))
        params = model.init(jax.random.key(0), levels, feats,
                            method=model.forward_gathered)
        tx = build_optimizer(config, steps_per_epoch=1)
        template = TrainState(params=params, opt_state=tx.init(params),
                              step=jnp.zeros((), jnp.int32),
                              key=jax.random.key(0))
        state = load_checkpoint(args.checkpoint, template)

        from tpu_sage.dist.partition import fetch_replicated

        # shard_graph / fetch_replicated are multi-host-safe: on a
        # cross-process mesh each process contributes its addressable shards
        # and fetches the replicated result; process 0 alone writes the file
        mesh = make_mesh()
        params = state.params
        if jax.process_count() > 1:
            # checkpoint-loaded params live on local device 0; a global-mesh
            # jit needs them placed replicated over the cross-process mesh
            from jax.sharding import PartitionSpec as P

            from tpu_sage.dist.partition import put_sharded

            params = jax.tree.map(
                lambda a: put_sharded(np.asarray(a), mesh, P()), params
            )
        sharded, _ = shard_graph(problem.store, mesh, train=False)
        out = embed_all_nodes_partitioned(
            model, params, sharded, mesh,
            chunk=args.chunk, with_head=args.logits,
        )
        if args.out_dtype != "float32":
            out = out.astype(args.out_dtype)  # on device, pre-fetch
        arr = fetch_replicated(out)[: problem.n_nodes]
    else:
        trainer = Trainer(model, config, steps_per_epoch=1, task=problem.task)
        graph = problem.device_graph(train=False)
        template = trainer.init_state(graph)
        state = load_checkpoint(args.checkpoint, template)
        out = embed_all_nodes(model, state.params, graph, chunk=args.chunk,
                              with_head=args.logits)
        if args.out_dtype != "float32":
            out = out.astype(args.out_dtype)
        arr = np.asarray(out)
    import jax

    if jax.process_index() == 0:
        np.save(args.out, arr)
    print(json.dumps({
        "out": args.out, "shape": list(arr.shape),
        "kind": "logits" if args.logits else "embeddings",
        "from_step": int(state.step), "process": jax.process_index(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
