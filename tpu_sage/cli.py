"""CLI entry point (reference: ``train.py`` + ``run.sh``, SURVEY.md §3.1).

Flag names follow the reference's argparse surface (``--problem-path``,
``--aggregator-class``, ``--prep-class``, ``--n-train-samples``,
``--batch-size``, ``--lr-init``, ``--lr-schedule``, ``--epochs`` …) so run
scripts translate ~1:1. ``--cuda`` is replaced by the JAX platform (the TPU is
the default device; ``JAX_PLATFORMS=cpu`` to force host).

Usage:
    python -m tpu_sage.cli --problem-path data/cora/problem.h5 \
        --aggregator-class mean --n-train-samples 25,10 --epochs 10

    # no dataset files in this environment? generate a synthetic one:
    python -m tpu_sage.cli --synthetic sbm --epochs 10
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def parse_args(argv=None):
    # allow_abbrev=False: --config override detection scans raw argv for exact
    # flag spellings, so prefix abbreviations (--epoch for --epochs) must not
    # parse silently (they would win the parse yet lose the override check)
    ap = argparse.ArgumentParser(description="tpu_sage trainer", allow_abbrev=False)
    ap.add_argument("--config", default=None,
                    help="TrainConfig preset json (see configs/); explicit "
                         "flags override preset values")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--problem-path", help="path to problem.h5")
    src.add_argument(
        "--synthetic",
        choices=["sbm", "reddit-shaped"],
        help="generate a synthetic problem instead of loading one",
    )
    ap.add_argument("--aggregator-class", default="mean",
                    help="mean|max_pool|mean_pool|lstm|attention|gcn")
    ap.add_argument("--prep-class", default="identity",
                    help="identity|linear|node_embedding")
    ap.add_argument("--n-train-samples", default="25,10")
    ap.add_argument("--n-val-samples", default="25,10")
    ap.add_argument("--output-dims", default="128,128")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr-init", type=float, default=0.01)
    ap.add_argument("--lr-schedule", default="constant",
                    help="constant|linear|cyclical|sgdr")
    ap.add_argument("--weight-decay", type=float, default=0.0)
    ap.add_argument("--optimizer", default="adam", choices=["adam", "sgd"])
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--no-normalize", action="store_true",
                    help="skip final L2 normalization")
    ap.add_argument("--combine", default="concat", choices=["concat", "add"])
    ap.add_argument("--checkpoint-path", default=None,
                    help="save params+opt state here at end (and resume if present)")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="also checkpoint to --checkpoint-path every N epochs "
                         "mid-run (crash loses at most N epochs)")
    ap.add_argument("--no-eval", action="store_true", help="skip per-epoch validation")
    ap.add_argument("--patience", type=int, default=None,
                    help="early stopping: stop after N epochs without "
                         "val-metric improvement (default off)")
    ap.add_argument("--save-best", action="store_true",
                    help="write --checkpoint-path only on val improvement "
                         "(the file always holds the best-so-far state)")
    ap.add_argument("--exact-val", action="store_true",
                    help="validate with EXACT full-graph layer-wise inference "
                         "(variance-free serving-mode metric; mean/gcn/pool "
                         "aggregators, dense adjacency)")
    ap.add_argument("--exact-val-every", type=int, default=None,
                    help="run the exact full-graph validation every K epochs "
                         "(sampled in between; final epoch and test always "
                         "exact). Implies --exact-val; default 1")
    ap.add_argument("--val-interval", type=int, default=None,
                    help="also validate every N train batches (reference-style)")
    ap.add_argument("--partitioned", action="store_true",
                    help="node-sharded multi-chip training over a 'data' mesh "
                         "of all visible devices (halo-exchange path)")
    ap.add_argument("--halo", default=None,
                    choices=["auto", "measured", "exact", "ring", "pipelined",
                             "bucketed", "hier2d"],
                    help="halo-exchange implementation for --partitioned "
                         "(default auto = exact, the round-3 measured winner "
                         "at every shard count — SCALING_r03.json; 'measured' "
                         "races exact/ring/pipelined with real epochs on the "
                         "live mesh at startup and picks the winner; "
                         "'pipelined' interleaves all levels' ring chains "
                         "hop-major; 'hier2d' routes within-host before "
                         "cross-host on a (host, chip) mesh)")
    ap.add_argument("--halo-capacity-factor", type=float, default=None,
                    help="bucketed-halo capacity factor (default 2.0)")
    ap.add_argument("--halo-chunks", type=int, default=None,
                    help="split each exact halo exchange into k query chunks "
                         "(descriptor-stream overlap inside shard_map; "
                         "default 10 — the round-4 measured winner at "
                         "headline scale; 1 disables)")
    ap.add_argument("--halo-measure-steps", type=int, default=None,
                    help="steps per timed racing epoch for --halo measured "
                         "(default 20; 2 timed runs after a warm-up)")
    ap.add_argument("--fuse-first-layer", action="store_true",
                    help="whole-table projection first layer (mean+identity; "
                         "custom-VJP training path — see RESULTS.md tradeoffs)")
    ap.add_argument("--gather-form", default=None,
                    choices=["masked", "plain", "masked_chunked"],
                    help="TPU gather lowering (default: the measured "
                         "per-workload policy — plain for supervised, "
                         "masked_chunked for the 12x-larger unsupervised "
                         "tree). 'masked' forces the materialized round-2d "
                         "form; 'masked_chunked' additionally splits the "
                         "non-deepest masked gathers into overlapping "
                         "descriptor streams (the round-5 unsupervised "
                         "winner) — RESULTS.md")
    ap.add_argument("--gather-form-deep", default=None,
                    choices=["masked", "plain"],
                    help="deepest fused level's gather form, overriding "
                         "--gather-form's base (default: follow it; masked "
                         "measured optimal at the unsupervised 1.5M-row "
                         "scale — RESULTS.md r5 §6)")
    ap.add_argument("--compute-dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="matmul/feature-table dtype (default float32; "
                         "bfloat16 halves the resident feature table and "
                         "the gathered bytes on the MXU path — the headline "
                         "bench configuration)")
    ap.add_argument("--gather-chunks", type=int, default=None,
                    help="split big gathers into k independent ops so their "
                         "descriptor streams overlap (default 10; 1 disables; "
                         "divisors of the deepest level's root count win)")
    ap.add_argument("--fuse-last", default=None, choices=["auto", "off", "all"],
                    help="deepest-level fused gather+summary (default auto: "
                         "on for all aggregators except lstm, by measurement)")
    ap.add_argument("--csr-adjacency", action="store_true",
                    help="store the adjacency as CSR on device (nnz ids "
                         "instead of n*max_degree — memory-lean; composes "
                         "with --unsupervised and --partitioned; 93%% of the "
                         "dense path's measured throughput)")
    ap.add_argument("--feature-int8", action="store_true",
                    help="store node features int8 with per-column scales "
                         "(halves the resident table and gathered bytes; "
                         "on --partitioned the halo exchange ships int8 rows)")
    ap.add_argument("--reorder", default=None, choices=["degree", "locality"],
                    help="node reordering pass before partitioning: 'degree' "
                         "balances edges across shards, 'locality' co-locates "
                         "communities to cut cross-shard halo queries "
                         "(label propagation; see dist/partition.py)")
    ap.add_argument("--unsupervised", action="store_true",
                    help="train with the skip-gram negative-sampling objective "
                         "instead of the supervised head")
    ap.add_argument("--walk-length", type=int, default=3)
    ap.add_argument("--n-negatives", type=int, default=10)
    ap.add_argument("--probe-every", type=int, default=0,
                    help="unsupervised: compute the logistic-probe val "
                         "accuracy every K epochs and record it in the "
                         "history (0 = final epoch only; --patience/"
                         "--save-best key on this metric)")
    ap.add_argument("--debug-nans", action="store_true",
                    help="enable jax_debug_nans (SURVEY.md §5.2)")
    ap.add_argument("--log-path", default=None,
                    help="also append metric records to this JSONL file")
    # synthetic-generator knobs
    ap.add_argument("--synthetic-nodes", type=int, default=2708)
    ap.add_argument("--synthetic-classes", type=int, default=7)
    ap.add_argument("--synthetic-feat-dim", type=int, default=64)
    ap.add_argument("--synthetic-task", default="classification")
    return ap.parse_args(argv)


def _parse_ints(s: str):
    return tuple(int(x) for x in s.split(",") if x.strip())


def main(argv=None):
    import sys as _sys

    raw_argv = list(_sys.argv[1:] if argv is None else argv)
    args = parse_args(argv)

    fanouts = _parse_ints(args.n_train_samples)
    val_fanouts = _parse_ints(args.n_val_samples)
    output_dims = _parse_ints(args.output_dims)
    if not (len(fanouts) == len(val_fanouts) == len(output_dims)):
        print(
            f"error: --n-train-samples/--n-val-samples/--output-dims must have "
            f"matching lengths (got {len(fanouts)}/{len(val_fanouts)}/{len(output_dims)})",
            file=sys.stderr,
        )
        return 2

    # Late imports keep `--help` fast (no jax/TPU bring-up).
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.nn.aggregators import aggregator_lookup
    from tpu_sage.nn.preps import prep_lookup
    from tpu_sage.train.lr import LRSchedule
    from tpu_sage.train.trainer import TrainConfig, fit

    for name, lookup in (
        ("--aggregator-class", aggregator_lookup),
        ("--prep-class", prep_lookup),
    ):
        val = getattr(args, name.strip("-").replace("-", "_"))
        if val not in lookup:
            print(
                f"error: {name} {val!r} unknown; choose from {sorted(lookup)}",
                file=sys.stderr,
            )
            return 2
    if args.lr_schedule not in LRSchedule.lookup:
        print(
            f"error: --lr-schedule {args.lr_schedule!r} unknown; "
            f"choose from {sorted(LRSchedule.lookup)}",
            file=sys.stderr,
        )
        return 2

    if args.synthetic:
        from tpu_sage.data.synthetic import bench_store, sbm_store
        from tpu_sage.data.problem import NodeProblem as NP

        if args.synthetic == "sbm":
            store = sbm_store(
                n_nodes=args.synthetic_nodes,
                n_classes=args.synthetic_classes,
                feat_dim=args.synthetic_feat_dim,
                task=args.synthetic_task,
                seed=args.seed,
            )
        else:
            store = bench_store(n_nodes=args.synthetic_nodes, seed=args.seed)
        problem = NP(store)
    else:
        problem = NodeProblem.from_h5(args.problem_path)

    if args.reorder:
        import jax

        from tpu_sage.data.problem import NodeProblem as _NP
        from tpu_sage.dist.partition import (degree_balanced_permutation,
                                             edge_cut_fraction,
                                             locality_permutation,
                                             reorder_store)

        st = problem.store
        n_shards = max(1, len(jax.devices()))
        if args.reorder == "degree":
            perm = degree_balanced_permutation(st.degrees, n_shards)
        else:
            perm = locality_permutation(st.adj, st.degrees)
        st2 = reorder_store(st, perm)
        print(json.dumps({
            "reorder": args.reorder,
            "edge_cut_before": round(edge_cut_fraction(st, n_shards), 4),
            "edge_cut_after": round(edge_cut_fraction(st2, n_shards), 4),
        }), flush=True)
        problem = _NP(st2)

    flag_values = {
        "aggregator_class": args.aggregator_class,
        "prep_class": args.prep_class,
        "n_train_samples": fanouts,
        "n_val_samples": val_fanouts,
        "output_dims": output_dims,
        "batch_size": args.batch_size,
        "epochs": args.epochs,
        "lr_init": args.lr_init,
        "lr_schedule": args.lr_schedule,
        "weight_decay": args.weight_decay,
        "optimizer": args.optimizer,
        "seed": args.seed,
        "combine": args.combine,
        "normalize": not args.no_normalize,
    }
    if args.halo is not None:
        flag_values["halo"] = args.halo
    if args.halo_capacity_factor is not None:
        flag_values["halo_capacity_factor"] = args.halo_capacity_factor
    if args.halo_chunks is not None:
        flag_values["halo_chunks"] = args.halo_chunks
    if args.halo_measure_steps is not None:
        flag_values["halo_measure_steps"] = args.halo_measure_steps
    if args.fuse_first_layer:
        flag_values["fuse_first_layer"] = True
    if args.feature_int8:
        flag_values["feature_int8"] = True
    if args.gather_form is not None:
        flag_values["gather_form"] = args.gather_form
    if args.gather_form_deep is not None:
        flag_values["gather_form_deep"] = args.gather_form_deep
    if args.compute_dtype is not None:
        flag_values["compute_dtype"] = args.compute_dtype
    if args.gather_chunks is not None:
        flag_values["gather_chunks"] = args.gather_chunks
    if args.fuse_last is not None:
        flag_values["fuse_last"] = args.fuse_last
    if args.exact_val or args.exact_val_every is not None:
        flag_values["exact_val"] = True
    if args.exact_val_every is not None:
        flag_values["exact_val_every"] = args.exact_val_every
    if args.patience is not None:
        flag_values["patience"] = args.patience
    if args.save_best:
        flag_values["save_best"] = True
    if args.config:
        # preset json is the base; flags PRESENT ON THE COMMAND LINE override
        # it (detected from raw argv so passing a flag's default value still
        # counts as explicit)
        config = TrainConfig.from_json(args.config)
        present = {a.split("=", 1)[0] for a in raw_argv if a.startswith("--")}
        explicit = {
            opt.lstrip("-").replace("-", "_") for opt in present
        }
        override_keys = {
            "aggregator_class", "prep_class", "batch_size", "epochs",
            "lr_init", "lr_schedule", "weight_decay", "optimizer", "seed",
            "combine",
        }
        overrides = {k: flag_values[k] for k in override_keys & explicit}
        if "n_train_samples" in explicit:
            overrides["n_train_samples"] = fanouts
        if "n_val_samples" in explicit:
            overrides["n_val_samples"] = val_fanouts
        if "output_dims" in explicit:
            overrides["output_dims"] = output_dims
        if args.no_normalize:
            overrides["normalize"] = False
        if args.halo is not None:
            overrides["halo"] = args.halo
        if args.halo_capacity_factor is not None:
            overrides["halo_capacity_factor"] = args.halo_capacity_factor
        if args.halo_chunks is not None:
            overrides["halo_chunks"] = args.halo_chunks
        if args.halo_measure_steps is not None:
            overrides["halo_measure_steps"] = args.halo_measure_steps
        if args.fuse_first_layer:
            overrides["fuse_first_layer"] = True
        if args.feature_int8:
            overrides["feature_int8"] = True
        if args.gather_form is not None:
            overrides["gather_form"] = args.gather_form
        if args.gather_form_deep is not None:
            overrides["gather_form_deep"] = args.gather_form_deep
        if args.compute_dtype is not None:
            overrides["compute_dtype"] = args.compute_dtype
        if args.gather_chunks is not None:
            overrides["gather_chunks"] = args.gather_chunks
        if args.fuse_last is not None:
            overrides["fuse_last"] = args.fuse_last
        if args.exact_val or args.exact_val_every is not None:
            overrides["exact_val"] = True
        if args.exact_val_every is not None:
            overrides["exact_val_every"] = args.exact_val_every
        if args.patience is not None:
            overrides["patience"] = args.patience
        if args.save_best:
            overrides["save_best"] = True
        config = config.replace(**overrides)
    else:
        config = TrainConfig(**flag_values)
    print(json.dumps({
        "task": problem.task, "n_nodes": problem.n_nodes,
        "feat_dim": problem.feats_dim, "n_classes": problem.n_classes,
        "config": {k: (list(v) if isinstance(v, tuple) else v)
                   for k, v in config.__dict__.items()},
    }), flush=True)

    log = None
    if args.log_path:
        logf = open(args.log_path, "a")

        def log(rec):
            print(json.dumps(rec), flush=True)
            logf.write(json.dumps(rec) + "\n")
            logf.flush()

    if args.checkpoint_every > 0 and not args.checkpoint_path:
        print("error: --checkpoint-every requires --checkpoint-path",
              file=sys.stderr)
        return 2
    try:
        return _run_fit(args, problem, config, log)
    except Exception as e:  # graceful capacity error (SURVEY §7.3 #6)
        from tpu_sage.bench.capacity import oom_advice, over_budget

        st = problem.store
        msg = str(e)
        oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
        # model the run's ACTUAL storage + residency: int8 > compute_dtype
        # table; supervised fit() keeps the train-edge AND full-edge graphs
        # resident, the unsupervised loop uploads the full graph only for
        # the probe (n_graphs=1 with --no-eval); partitioned runs shard
        # node storage across the mesh, so the per-DEVICE node count is
        # what must fit (a fitting 8-shard run must not have an unrelated
        # compile crash swallowed by a whole-graph over-budget verdict)
        feature = ("int8" if args.feature_int8 else config.compute_dtype)
        # both fit loops upload the full-edge eval graph lazily on first
        # validation use, so a --no-eval run holds ONE adjacency table
        n_graphs = 1 if (args.no_eval and not args.val_interval) else 2
        n_nodes = st.n_nodes
        if args.partitioned:
            import jax

            n_nodes = -(-st.n_nodes // max(1, jax.device_count()))
        cap_kw = dict(csr=args.csr_adjacency, feature=feature,
                      n_graphs=n_graphs)
        # the axon backend surfaces compile-time HBM-planning failures as an
        # opaque HTTP-500 compile-helper crash (bench_logs/r5_capacity_*);
        # classify it as capacity only when the model agrees the graph is
        # over the measured budget — other compile crashes re-raise
        if not oom and not (
            "tpu_compile_helper" in msg
            and over_budget(n_nodes, st.feat_dim, st.adj.shape[1], **cap_kw)
        ):
            raise
        print("error: " + oom_advice(
            n_nodes, st.feat_dim, st.adj.shape[1], **cap_kw,
        ), file=sys.stderr)
        return 1


def _run_fit(args, problem, config, log):
    if args.partitioned and args.unsupervised:
        from tpu_sage.dist.unsupervised import fit_unsupervised_partitioned
        from tpu_sage.train.unsupervised import UnsupConfig

        trainer, state, history = fit_unsupervised_partitioned(
            problem.store, config,
            UnsupConfig(walk_length=args.walk_length,
                        n_negatives=args.n_negatives,
                        probe_every=args.probe_every),
            log=log,
            resume_from=args.checkpoint_path,
            checkpoint_every=args.checkpoint_every,
            probe=not args.no_eval,  # paper protocol: logistic probe on the
            # partitioned-path embeddings (logged by the fit loop itself)
            csr=args.csr_adjacency,
        )
    elif args.partitioned:
        from tpu_sage.dist.train import fit_partitioned

        trainer, state, history = fit_partitioned(
            problem.store, config, log=log,
            eval_every_epoch=not args.no_eval,
            resume_from=args.checkpoint_path,
            checkpoint_every=args.checkpoint_every,
            csr=args.csr_adjacency,
        )
    elif args.unsupervised:
        from tpu_sage.train.unsupervised import UnsupConfig, fit_unsupervised

        trainer, state, history = fit_unsupervised(
            problem, config,
            UnsupConfig(walk_length=args.walk_length,
                        n_negatives=args.n_negatives,
                        probe_every=args.probe_every),
            log=log,
            resume_from=args.checkpoint_path,
            checkpoint_every=args.checkpoint_every,
            probe=not args.no_eval,  # paper protocol: logistic probe on the
            # learned embeddings (logged by the fit loop itself)
            csr=args.csr_adjacency,
        )
    else:
        from tpu_sage.train.trainer import fit

        trainer, state, history = fit(
            problem, config, eval_every_epoch=not args.no_eval,
            resume_from=args.checkpoint_path, log=log,
            val_interval_batches=args.val_interval,
            checkpoint_every=args.checkpoint_every,
            csr=args.csr_adjacency,
        )

    if args.checkpoint_path:
        from tpu_sage.train.checkpoint import save_checkpoint

        if not args.save_best:
            save_checkpoint(args.checkpoint_path, state, config=config)
            print(json.dumps({"checkpoint": args.checkpoint_path}), flush=True)
        elif args.checkpoint_every > 0:
            # --save-best already wrote the best-so-far state to the path
            # itself; keep the periodic .last sibling current with the FINAL
            # state so a later resume continues from the end of this run
            save_checkpoint(args.checkpoint_path + ".last", state, config=config)
            print(json.dumps({"checkpoint": args.checkpoint_path + ".last"}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
