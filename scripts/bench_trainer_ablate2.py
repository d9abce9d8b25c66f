"""Bisect WHY the 1-shard partitioned epoch beats the Trainer epoch.

bench_trainer_ablate.py (232 965 nodes, batch 512, (25,10), bf16, 200-step
scans) measured: Trainer 4.41 / packed 4.31 / packed+explicit-gathers 4.32 /
partitioned-1shard 3.75 ms/step — the partitioned formulation is ~15%
faster at IDENTICAL per-step math. This script isolates the scaffolding
differences one at a time:

  D  PartitionedTrainer 1-shard exact, run FIRST (order-effect check)
  E  D but halo gather replaced by a plain local ``table[ids]``
     (still shard_map + xs=None scan + psum) — if still ~3.75 the win is
     the scaffolding, not the dist_gather form
  G  plain (no shard_map) epoch, xs=None scan, ids/targets sliced on
     device from a precomputed permutation — C's math with D's data flow
  F  plain epoch, xs-streamed scan (C's data flow) but every gather in
     the 1-shard dist_gather FORM: leading unit batch dim + clip + mask
  A  Trainer as-is, re-run LAST (drift check)

Prints JSONL; conclusions go to STATUS.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax


def main():
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.sample.sampler import pack_adjacency, select_columns
    from tpu_sage.train.trainer import (TrainConfig, Trainer, TrainState,
                                        build_model)

    n_nodes = int(os.environ.get("ABL_NODES", 232965))
    steps = int(os.environ.get("ABL_STEPS", 200))
    repeats = int(os.environ.get("ABL_REPEATS", 3))
    batch = 512
    fanouts = (25, 10)

    store = bench_store(n_nodes=n_nodes, seed=0)
    problem = NodeProblem(store)
    config = TrainConfig(
        batch_size=batch, n_train_samples=fanouts, n_val_samples=fanouts,
        output_dims=(128, 128), epochs=1, lr_init=0.01,
        compute_dtype="bfloat16",
    )
    train_ids = problem.folds["train"]
    spe = len(train_ids) // batch
    model = build_model(config, problem.n_nodes, problem.n_classes)
    trainer = Trainer(model, config, spe, task=problem.task)
    graph = problem.device_graph(train=True, dtype=jnp.bfloat16)
    fresh_state = lambda: trainer.init_state(graph)

    n = min(steps, spe) * batch
    fold_ids = jnp.asarray(train_ids[:n], jnp.int32)
    fold_tgt = jnp.asarray(store.targets[train_ids[:n]])
    n_steps = n // batch

    def timed(run, state):
        state, m = run(state)
        float(m["loss"])
        out = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            state, m = run(state)
            float(m["loss"])
            out.append((time.perf_counter() - t0) * 1e3 / n_steps)
        return sorted(out)[len(out) // 2], [round(t, 4) for t in out]

    def report(name, med, all_t):
        print(json.dumps({"variant": name, "ms_per_step": round(med, 4),
                          "all": all_t}), flush=True)

    # --- D first: partitioned 1-shard (order-effect check) ----------------
    from tpu_sage.dist.mesh import make_mesh
    from tpu_sage.dist.train import PartitionedTrainer

    def partitioned(gather_override=None, tag="D_partitioned_first"):
        ptrainer, pgraph, pfold_ids, pfold_w = PartitionedTrainer.from_store(
            store, config, make_mesh())
        if gather_override is not None:
            ptrainer.gather = gather_override
        pstate = ptrainer.init_state(feat_dim=store.feat_dim)
        med, all_t = timed(
            lambda st: ptrainer.train_epoch(st, pgraph, pfold_ids, pfold_w,
                                            n_steps=n_steps),
            pstate)
        report(tag, med, all_t)

    partitioned()

    # --- E: shard_map scaffolding, plain local gathers --------------------
    partitioned(gather_override=lambda t, i, a: t[i],
                tag="E_shardmap_local_gather")

    # shared pieces for G/F
    tx = trainer.tx
    loss_fn = trainer.loss_fn
    adj_deg_host = pack_adjacency(graph.adj, graph.degrees)

    def sample_packed(sample_key, adj_deg, ids, gather_adj):
        levels = [ids.astype(jnp.int32)]
        for fanout in fanouts:
            sample_key, sub = jax.random.split(sample_key)
            cur = levels[-1]
            rows = gather_adj(adj_deg, cur)
            r_adj, deg = rows[:, :-1], jnp.maximum(rows[:, -1], 1)
            u = jax.random.uniform(sub, (cur.shape[0], fanout))
            cols = jnp.minimum(
                (u * deg[:, None].astype(u.dtype)).astype(jnp.int32),
                deg[:, None] - 1)
            levels.append(select_columns(r_adj, cols).reshape(-1))
        return levels

    # --- G: plain epoch, xs=None, device-sliced ids/targets ---------------
    @jax.jit
    def run_g(state, adj_deg, feats, fold_ids, fold_tgt):
        key, perm_key = jax.random.split(state.key)
        perm = jax.random.permutation(perm_key, fold_ids.shape[0])[:n]
        ids_all = fold_ids[perm]
        tgt_all = fold_tgt[perm]

        def body(carry, _):
            params, opt_state, step, k = carry
            t = step % n_steps
            ids = lax.dynamic_slice_in_dim(ids_all, t * batch, batch)
            targets = lax.dynamic_slice_in_dim(tgt_all, t * batch, batch)
            k, sample_key = jax.random.split(k)

            def floss(p):
                levels = sample_packed(sample_key, adj_deg, ids,
                                       lambda tb, i: tb[i])
                level_feats = [feats[l] for l in levels]
                logits = model.apply(p, levels, level_feats,
                                     method=model.forward_gathered)
                return loss_fn(logits, targets)

            loss, grads = jax.value_and_grad(floss)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, step + 1, k), loss

        (params, opt_state, step, _), losses = lax.scan(
            body, (state.params, state.opt_state, jnp.int32(0), key),
            None, length=n_steps)
        return (TrainState(params=params, opt_state=opt_state, step=step,
                           key=key), {"loss": losses.mean()})

    med, all_t = timed(
        lambda st: run_g(st, adj_deg_host, graph.feats, fold_ids, fold_tgt),
        fresh_state())
    report("G_plain_xsnone_devslice", med, all_t)

    # --- F: xs-streamed scan, gathers in 1-shard dist_gather form ---------
    def dist_form_gather(table, ids):
        m = table.shape[0]
        all_ids = ids[None, :]                       # "all_gather", n_dev=1
        idx = jnp.clip(all_ids, 0, m - 1)
        rows = table[idx]                            # (1, q, d)
        mask = (all_ids >= 0) & (all_ids < m)
        rows = jnp.where(mask[..., None], rows, 0)
        return rows[0]                               # "psum_scatter", n_dev=1

    @jax.jit
    def run_f(state, adj_deg, feats, fold_ids, fold_tgt):
        key, perm_key = jax.random.split(state.key)
        perm = jax.random.permutation(perm_key, fold_ids.shape[0])[:n]
        ids_b = fold_ids[perm].reshape(n_steps, batch)
        tgt_b = fold_tgt[perm].reshape((n_steps, batch) + fold_tgt.shape[1:])

        def body(carry, xs):
            params, opt_state, step, k = carry
            ids, targets = xs
            k, sample_key = jax.random.split(k)

            def floss(p):
                levels = sample_packed(sample_key, adj_deg, ids,
                                       dist_form_gather)
                level_feats = [dist_form_gather(feats, l) for l in levels]
                logits = model.apply(p, levels, level_feats,
                                     method=model.forward_gathered)
                return loss_fn(logits, targets)

            loss, grads = jax.value_and_grad(floss)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, step + 1, k), loss

        (params, opt_state, step, _), losses = lax.scan(
            body, (state.params, state.opt_state, state.step, key),
            (ids_b, tgt_b))
        return (TrainState(params=params, opt_state=opt_state, step=step,
                           key=key), {"loss": losses.mean()})

    med, all_t = timed(
        lambda st: run_f(st, adj_deg_host, graph.feats, fold_ids, fold_tgt),
        fresh_state())
    report("F_plain_distform_gathers", med, all_t)

    # --- A last: Trainer as-is (drift check) ------------------------------
    med, all_t = timed(
        lambda st: trainer.train_epoch(st, graph, fold_ids, fold_tgt),
        fresh_state())
    report("A_trainer_last", med, all_t)
    return 0


if __name__ == "__main__":
    sys.exit(main())
