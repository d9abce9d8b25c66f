"""Find the MINIMAL gather form that gets the fast TPU lowering.

bench_trainer_ablate2.py showed the full "dist form" gather (leading unit
dim + clip + mask-where) makes the plain xs-streamed epoch 3.82 ms/step
vs 4.31-4.43 with plain ``table[ids]`` — a 13% whole-step win from the
gather lowering alone. This script bisects the form: each variant runs the
identical 200-step training epoch with EVERY gather (adjacency rows +
features) expressed in that form.

  plain      table[ids]                                (slow reference)
  unit       table[ids[None, :]][0]                    leading unit dim only
  clip       table[clip(ids, 0, m-1)]                  clip only
  unitclip   table[clip(ids)[None, :]][0]
  mask       clip + where(in-bounds, rows, 0)          no unit dim
  dist       full form: unit dim + clip + mask         (fast reference)

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


def g_plain(table, ids):
    return table[ids]


def g_unit(table, ids):
    return table[ids[None, :]][0]


def g_clip(table, ids):
    return table[jnp.clip(ids, 0, table.shape[0] - 1)]


def g_unitclip(table, ids):
    return table[jnp.clip(ids, 0, table.shape[0] - 1)[None, :]][0]


def g_mask(table, ids):
    m = table.shape[0]
    rows = table[jnp.clip(ids, 0, m - 1)]
    ok = (ids >= 0) & (ids < m)
    return jnp.where(ok[:, None], rows, 0)


def g_dist(table, ids):
    m = table.shape[0]
    all_ids = ids[None, :]
    idx = jnp.clip(all_ids, 0, m - 1)
    rows = table[idx]
    mask = (all_ids >= 0) & (all_ids < m)
    rows = jnp.where(mask[..., None], rows, 0)
    return rows[0]


FORMS = {
    "plain": g_plain,
    "unit": g_unit,
    "clip": g_clip,
    "unitclip": g_unitclip,
    "mask": g_mask,
    "dist": g_dist,
}


def main():
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.sample.sampler import pack_adjacency, select_columns
    from tpu_sage.train.trainer import (TrainConfig, Trainer, TrainState,
                                        build_model)

    n_nodes = int(os.environ.get("ABL_NODES", 232965))
    steps = int(os.environ.get("ABL_STEPS", 200))
    repeats = int(os.environ.get("ABL_REPEATS", 3))
    only = os.environ.get("ABL_FORMS")  # comma list to subset
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

    tx = trainer.tx
    loss_fn = trainer.loss_fn
    adj_deg_host = pack_adjacency(graph.adj, graph.degrees)

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

    def sample_packed(sample_key, adj_deg, ids, gf):
        levels = [ids.astype(jnp.int32)]
        for fanout in fanouts:
            sample_key, sub = jax.random.split(sample_key)
            cur = levels[-1]
            rows = gf(adj_deg, cur)
            r_adj, deg = rows[:, :-1], jnp.maximum(rows[:, -1], 1)
            u = jax.random.uniform(sub, (cur.shape[0], fanout))
            cols = jnp.minimum(
                (u * deg[:, None].astype(u.dtype)).astype(jnp.int32),
                deg[:, None] - 1)
            levels.append(select_columns(r_adj, cols).reshape(-1))
        return levels

    def make_run(gf):
        @jax.jit
        def run(state, adj_deg, feats, fold_ids, fold_tgt):
            key, perm_key = jax.random.split(state.key)
            perm = jax.random.permutation(perm_key, fold_ids.shape[0])[:n]
            ids_b = fold_ids[perm].reshape(n_steps, batch)
            tgt_b = fold_tgt[perm].reshape((n_steps, batch) + fold_tgt.shape[1:])

            def body(carry, xs):
                params, opt_state, step, k = carry
                ids, targets = xs
                k, sample_key = jax.random.split(k)

                def floss(p):
                    levels = sample_packed(sample_key, adj_deg, ids, gf)
                    level_feats = [gf(feats, l) for l in levels]
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

        return lambda st: run(st, adj_deg_host, graph.feats, fold_ids,
                              fold_tgt)

    names = list(FORMS) if not only else only.split(",")
    for name in names:
        med, all_t = timed(make_run(FORMS[name]), fresh_state())
        print(json.dumps({"variant": name, "ms_per_step": round(med, 4),
                          "all": all_t}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
