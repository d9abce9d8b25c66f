"""Checkpoint save/restore roundtrip and resume-continuity."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_sage.data.synthetic import sbm_problem
from tpu_sage.train.checkpoint import load_checkpoint, save_checkpoint
from tpu_sage.train.trainer import TrainConfig, Trainer, build_model, fit


def _setup(tmp_path):
    problem = sbm_problem(n_nodes=300, n_classes=3, feat_dim=16, seed=21)
    cfg = TrainConfig(batch_size=32, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32))
    model = build_model(cfg, problem.n_nodes, problem.n_classes)
    trainer = Trainer(model, cfg, steps_per_epoch=5, task=problem.task)
    graph = problem.device_graph(train=True)
    return problem, trainer, graph


def test_roundtrip_bitexact(tmp_path):
    problem, trainer, graph = _setup(tmp_path)
    state = trainer.init_state(graph)
    ids = jnp.asarray(problem.folds["train"][:32], jnp.int32)
    tgt = jnp.asarray(problem.store.targets[problem.folds["train"][:32]])
    state, _ = trainer.train_step(state, graph, ids, tgt)

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state)
    template = trainer.init_state(graph)
    restored = load_checkpoint(path, template)

    assert int(restored.step) == int(state.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # PRNG key restored: next step is identical from both states
    s1, m1 = trainer.train_step(state, graph, ids, tgt)
    s2, m2 = trainer.train_step(restored, graph, ids, tgt)
    assert float(m1["loss"]) == float(m2["loss"])


def test_resume_continues_progress(tmp_path):
    problem, _, _ = _setup(tmp_path)
    cfg = TrainConfig(batch_size=32, epochs=2, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32))
    path = str(tmp_path / "resume.npz")

    _, state1, hist1 = fit(problem, cfg, log=lambda d: None, eval_every_epoch=False)
    save_checkpoint(path, state1)
    # identical command resumes at the epoch AFTER the checkpoint: with the
    # same epochs=2 nothing is left to run (exact-resume semantics)
    _, state2, hist2 = fit(problem, cfg, log=lambda d: None,
                           eval_every_epoch=False, resume_from=path)
    assert int(state2.step) == int(state1.step)
    assert hist2 == []
    # a longer run continues from epoch 2 and keeps improving
    _, state3, hist3 = fit(problem, cfg.replace(epochs=4), log=lambda d: None,
                           eval_every_epoch=False, resume_from=path)
    assert int(state3.step) == 2 * int(state1.step)
    assert hist3[0]["epoch"] == 2
    assert hist3[0]["train_loss"] < hist1[0]["train_loss"]


def test_checkpoint_shape_mismatch_raises(tmp_path):
    problem, trainer, graph = _setup(tmp_path)
    state = trainer.init_state(graph)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state)

    cfg_big = TrainConfig(batch_size=32, epochs=1, n_train_samples=(5, 3),
                          n_val_samples=(5, 3), output_dims=(64, 64))
    model_big = build_model(cfg_big, problem.n_nodes, problem.n_classes)
    trainer_big = Trainer(model_big, cfg_big, steps_per_epoch=5, task=problem.task)
    template = trainer_big.init_state(graph)
    try:
        load_checkpoint(path, template)
        assert False, "expected shape mismatch error"
    except ValueError as e:
        assert "mismatch" in str(e)


def test_resumed_save_best_does_not_clobber_best(tmp_path):
    """Round-4 review finding: a resumed save_best run must compare against
    the metric the best file already holds — BestTracker re-seeds from the
    recorded __best_metric__, so a worse post-resume epoch does NOT
    overwrite the best checkpoint."""
    from tpu_sage.data.synthetic import sbm_problem
    from tpu_sage.train.checkpoint import (BestTracker, checkpoint_step,
                                           read_best_metric, save_checkpoint)
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

    problem = sbm_problem(n_nodes=120, n_classes=3, feat_dim=8, seed=71)
    cfg = TrainConfig(batch_size=32, epochs=1, n_train_samples=(3, 2),
                      n_val_samples=(3, 2), output_dims=(8, 8),
                      save_best=True)
    model = build_model(cfg, problem.n_nodes, problem.n_classes)
    trainer = Trainer(model, cfg, 1, task=problem.task)
    graph = problem.device_graph(train=True)
    state = trainer.init_state(graph)

    ck = str(tmp_path / "best.npz")
    recs = []
    t1 = BestTracker(cfg, ck, recs.append)
    t1.update(0.95, state)                      # best written at step 0
    assert read_best_metric(ck) == 0.95
    best_step = checkpoint_step(ck)

    # "resume": a fresh tracker seeds from the stored metric
    t2 = BestTracker(cfg, ck, recs.append)
    assert t2.best == 0.95
    state2 = state.replace(step=state.step + 7)
    t2.update(0.80, state2)                      # worse — must NOT write
    assert read_best_metric(ck) == 0.95
    assert checkpoint_step(ck) == best_step
    t2.update(0.97, state2)                      # better — must write
    assert read_best_metric(ck) == 0.97
    assert checkpoint_step(ck) == best_step + 7
