"""Trainer-epoch structural ablation at matched shapes.

Round-2b found SCALING_r02's "replicated 3.444 ms/step" (65 536-node graph)
beats the 232 965-node Trainer headline (4.31) at IDENTICAL per-step work —
i.e. gather cost grows with table size (locality), it is not a structural
Trainer overhead. This script pins the graph at one size and ablates the
actual structural choices, all as jit'd scans on the same graph:

  A  Trainer.train_epoch as-is (baseline)
  B  Trainer body but sample_tree_packed (one adj‖deg gather per hop
     instead of separate adj and degree gathers)
  C  B + explicit per-level feature gathers outside the model
     (forward_gathered — the partitioned step's exact structure)
  D  PartitionedTrainer 1-shard exact (reference point)

Prints JSONL; medians go to STATUS.md.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax


def main():
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.sample.sampler import (gather_levels, pack_adjacency,
                                         sample_tree_packed)
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

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
    # Trainer.train_epoch donates its input state — give each variant a
    # fresh one
    fresh_state = lambda: trainer.init_state(graph)

    n = min(steps, spe) * batch
    fold_ids = jnp.asarray(train_ids[:n], jnp.int32)
    fold_tgt = jnp.asarray(store.targets[train_ids[:n]])
    n_steps = n // batch

    def timed(run, state):
        state, m = run(state)           # compile + warm
        float(m["loss"])
        out = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            state, m = run(state)
            float(m["loss"])
            out.append((time.perf_counter() - t0) * 1e3 / n_steps)
        return sorted(out)[len(out) // 2], [round(t, 4) for t in out]

    # --- A: Trainer as-is -------------------------------------------------
    med, all_t = timed(
        lambda st: trainer.train_epoch(st, graph, fold_ids, fold_tgt),
        fresh_state(),
    )
    print(json.dumps({"variant": "A_trainer", "ms_per_step": round(med, 4),
                      "all": all_t}), flush=True)

    # shared scaffolding for B/C: same permute→reshape→scan as Trainer
    tx = trainer.tx
    loss_fn = trainer.loss_fn
    adj_deg = pack_adjacency(graph.adj, graph.degrees)

    def make_epoch(body_loss):
        # adj_deg / feats must be jit ARGUMENTS: closed-over device arrays
        # are baked into the program as constants, and a 100+ MB constant
        # blows the axon remote-compile request limit (HTTP 413)
        @jax.jit
        def run_inner(state, adj_deg, feats):
            key, perm_key = jax.random.split(state.key)
            perm = jax.random.permutation(perm_key, fold_ids.shape[0])[:n]
            ids_b = fold_ids[perm].reshape(n_steps, batch)
            tgt_b = fold_tgt[perm].reshape((n_steps, batch) + fold_tgt.shape[1:])

            def body(carry, xs):
                params, opt_state, step, k = carry
                ids, targets = xs
                k, sample_key = jax.random.split(k)
                loss, grads = jax.value_and_grad(
                    lambda p: body_loss(p, sample_key, ids, targets,
                                        adj_deg, feats)
                )(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, step + 1, k), loss

            (params, opt_state, step, _), losses = lax.scan(
                body, (state.params, state.opt_state, state.step, key),
                (ids_b, tgt_b))
            from tpu_sage.train.trainer import TrainState
            return (TrainState(params=params, opt_state=opt_state, step=step,
                               key=key), {"loss": losses.mean()})

        return lambda state: run_inner(state, adj_deg, graph.feats)

    # --- B: packed one-gather hops, model gathers feats internally --------
    def loss_b(p, sample_key, ids, targets, adj_deg, feats):
        levels = sample_tree_packed(sample_key, adj_deg, ids, fanouts)
        logits = model.apply(p, levels, feats)
        return loss_fn(logits, targets)

    med, all_t = timed(make_epoch(loss_b), fresh_state())
    print(json.dumps({"variant": "B_packed", "ms_per_step": round(med, 4),
                      "all": all_t}), flush=True)

    # --- C: packed hops + explicit level gathers + forward_gathered -------
    def loss_c(p, sample_key, ids, targets, adj_deg, feats):
        levels = sample_tree_packed(sample_key, adj_deg, ids, fanouts)
        level_feats = [feats[l] for l in levels]
        logits = model.apply(p, levels, level_feats,
                             method=model.forward_gathered)
        return loss_fn(logits, targets)

    med, all_t = timed(make_epoch(loss_c), fresh_state())
    print(json.dumps({"variant": "C_packed_gathered", "ms_per_step": round(med, 4),
                      "all": all_t}), flush=True)

    # --- D: 1-shard partitioned reference ---------------------------------
    from tpu_sage.dist.mesh import make_mesh
    from tpu_sage.dist.train import PartitionedTrainer

    ptrainer, pgraph, pfold_ids, pfold_w = PartitionedTrainer.from_store(
        store, config, make_mesh())
    pstate = ptrainer.init_state(feat_dim=store.feat_dim)

    def run_d(st):
        return ptrainer.train_epoch(st, pgraph, pfold_ids, pfold_w,
                                    n_steps=n_steps)

    med, all_t = timed(run_d, pstate)
    print(json.dumps({"variant": "D_partitioned_1shard", "ms_per_step": round(med, 4),
                      "all": all_t}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
