"""Partitioned unsupervised NCE training on the 8-device CPU mesh
(VERDICT round-1 #1: the multi-chip unsupervised path)."""

import jax
import numpy as np
from sklearn.linear_model import LogisticRegression

from tpu_sage.data.synthetic import sbm_problem, sbm_store
from tpu_sage.dist.mesh import make_mesh
from tpu_sage.dist.unsupervised import (PartitionedUnsupervisedTrainer,
                                        fit_unsupervised_partitioned)
from tpu_sage.train.trainer import TrainConfig
from tpu_sage.train.unsupervised import UnsupConfig


def test_partitioned_unsupervised_embeddings_are_useful(eight_devices):
    """Same contract as the single-device test, with the VERDICT-r2 #9 gate:
    the partitioned-path probe reaches ≥ 0.8× the supervised val accuracy on
    the same graph/seed, and the probe is recorded in the fit history."""
    from tpu_sage.train.trainer import fit

    mesh = make_mesh()
    problem = sbm_problem(n_nodes=600, n_classes=4, feat_dim=32, avg_degree=8,
                          p_in=0.95, feat_noise=1.0, seed=11)
    cfg = TrainConfig(batch_size=128, epochs=3, n_train_samples=(8, 4),
                      n_val_samples=(8, 4), output_dims=(32, 32), lr_init=0.005)
    trainer, state, hist = fit_unsupervised_partitioned(
        problem.store, cfg, UnsupConfig(walk_length=2, n_negatives=5),
        mesh=mesh, log=lambda d: None,
    )
    assert hist[-1]["unsup_loss"] < hist[0]["unsup_loss"]
    assert hist[-1]["n_shards"] == 8
    acc = hist[-1]["probe_val_accuracy"]

    _, _, sup_hist = fit(problem, cfg.replace(lr_init=0.01),
                         log=lambda d: None)
    assert acc >= 0.8 * sup_hist[-1]["val_metric"], (
        acc, sup_hist[-1]["val_metric"]
    )

    train_ids = problem.folds["train"]
    z_train = trainer.embed_fold(state, problem.store, train_ids)
    assert z_train.shape == (len(train_ids), 64)  # concat combine: 2*output_dim


def test_partitioned_unsupervised_degree_smoothed_negatives(eight_devices):
    """neg_power > 0 routes negatives through the replicated degree logits."""
    mesh = make_mesh()
    store = sbm_store(n_nodes=256, n_classes=3, feat_dim=16, avg_degree=6,
                      seed=13)
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(16, 16), lr_init=0.01)
    unsup = UnsupConfig(walk_length=2, n_negatives=4, neg_power=0.75)
    trainer, graph, fold_ids, fold_w = PartitionedUnsupervisedTrainer.from_store(
        store, cfg, unsup, mesh
    )
    neg_logits = trainer.neg_logits(store)
    assert neg_logits is not None and neg_logits.shape == (256,)
    state = trainer.init_state(feat_dim=store.feat_dim)
    state, m = trainer.train_epoch(state, graph, fold_ids, fold_w,
                                   neg_logits=neg_logits)
    assert np.isfinite(float(m["loss"]))


def test_partitioned_unsupervised_resume(tmp_path, eight_devices):
    """Periodic checkpoint + exact-epoch resume through the partitioned
    unsupervised fit loop."""
    mesh = make_mesh()
    store = sbm_store(n_nodes=256, n_classes=3, feat_dim=16, seed=17)
    cfg = TrainConfig(batch_size=64, epochs=2, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(16, 16), lr_init=0.01)
    ckpt = str(tmp_path / "u.npz")
    recs = []
    fit_unsupervised_partitioned(store, cfg, UnsupConfig(walk_length=2),
                                 mesh=mesh, log=recs.append,
                                 resume_from=ckpt, checkpoint_every=1)
    assert any("checkpoint" in r for r in recs)
    # resume with more epochs: starts at epoch 2, not 0
    cfg4 = cfg.replace(epochs=4)
    recs2 = []
    fit_unsupervised_partitioned(store, cfg4, UnsupConfig(walk_length=2),
                                 mesh=mesh, log=recs2.append,
                                 resume_from=ckpt, checkpoint_every=1)
    resumed = next(r for r in recs2 if "resumed_from" in r)
    assert resumed["start_epoch"] == 2
    epochs = [r["epoch"] for r in recs2 if "epoch" in r]
    assert epochs == [2, 3]


def test_partitioned_unsupervised_hier2d(eight_devices):
    """--unsupervised --partitioned --halo hier2d works end to end: the fit
    loop auto-builds the (host, chip) mesh / tuple axis (the supervised loop
    already did; the unsupervised twin used to crash on a flat mesh)."""
    problem = sbm_problem(n_nodes=400, n_classes=3, feat_dim=16, avg_degree=6,
                          p_in=0.9, seed=15)
    cfg = TrainConfig(batch_size=64, epochs=2, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(16, 16),
                      lr_init=0.005, halo="hier2d")
    trainer, state, hist = fit_unsupervised_partitioned(
        problem.store, cfg, UnsupConfig(walk_length=2, n_negatives=4),
        log=lambda d: None,
    )
    assert trainer.halo_mode == "hier2d"
    assert hist[-1]["unsup_loss"] < hist[0]["unsup_loss"] * 1.05
    assert np.isfinite(hist[-1]["probe_val_accuracy"])


def test_partitioned_unsupervised_halo_measured(eight_devices):
    """halo='measured' races the candidates with the REAL NCE epoch (the
    per-workload knob lesson: the supervised winner is not assumed) and the
    resolved mode + per-mode timings appear in the log."""
    mesh = make_mesh()
    store = sbm_store(n_nodes=256, n_classes=3, feat_dim=16, avg_degree=6,
                      seed=17)
    cfg = TrainConfig(batch_size=64, epochs=2, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(16, 16),
                      lr_init=0.005, halo="measured", halo_measure_steps=2)
    recs = []
    trainer, state, hist = fit_unsupervised_partitioned(
        store, cfg, UnsupConfig(walk_length=2, n_negatives=4),
        mesh=mesh, log=recs.append, probe=False,
    )
    resolved = next(r for r in recs if "halo" in r)
    modes = resolved["halo_measured_ms"]  # purely {mode: ms/step} since r5
    assert set(modes) == {"exact", "ring", "pipelined"}
    if "halo_measured_fallback" in resolved:
        assert trainer.halo_mode == "exact"
    else:
        assert trainer.halo_mode == min(modes, key=modes.get)
    assert np.isfinite(hist[-1]["unsup_loss"])
