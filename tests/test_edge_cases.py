"""Robustness: depth-generic models, tiny folds, degenerate shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_sage.data.synthetic import sbm_problem, sbm_store
from tpu_sage.nn.model import GSSupervised, default_layer_specs
from tpu_sage.train.trainer import TrainConfig, fit


def test_three_layer_model():
    """Depth is generic: 3 aggregation layers, fanouts (6, 4, 3)."""
    problem = sbm_problem(n_nodes=400, n_classes=3, feat_dim=16, seed=41)
    cfg = TrainConfig(batch_size=32, epochs=3, n_train_samples=(6, 4, 3),
                      n_val_samples=(6, 4, 3), output_dims=(32, 32, 32))
    _, _, hist = fit(problem, cfg, log=lambda d: None)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert hist[-1]["val_metric"] > 0.5


def test_one_layer_model():
    problem = sbm_problem(n_nodes=300, n_classes=3, feat_dim=16, seed=42)
    cfg = TrainConfig(batch_size=32, epochs=3, n_train_samples=(8,),
                      n_val_samples=(8,), output_dims=(32,))
    _, _, hist = fit(problem, cfg, log=lambda d: None)
    assert hist[-1]["val_metric"] > 0.5


def test_fanout_one():
    """fanout=1 levels keep static shapes and train."""
    problem = sbm_problem(n_nodes=300, n_classes=3, feat_dim=16, seed=43)
    cfg = TrainConfig(batch_size=32, epochs=2, n_train_samples=(1, 1),
                      n_val_samples=(1, 1), output_dims=(16, 16))
    _, _, hist = fit(problem, cfg, log=lambda d: None)
    assert np.isfinite(hist[-1]["train_loss"])


def test_batch_larger_than_fold():
    """batch_size > train fold: steps_per_epoch clamps to 1 and the epoch
    trains on a full permutation slice without crashing."""
    problem = sbm_problem(n_nodes=120, n_classes=3, feat_dim=8, seed=44)
    cfg = TrainConfig(batch_size=64, epochs=2, n_train_samples=(4, 3),
                      n_val_samples=(4, 3), output_dims=(16, 16))
    _, _, hist = fit(problem, cfg, log=lambda d: None)
    assert np.isfinite(hist[-1]["train_loss"])


def test_two_class_and_wide_class_counts():
    for n_classes in (2, 40):
        problem = sbm_problem(n_nodes=300, n_classes=n_classes, feat_dim=16,
                              seed=45)
        cfg = TrainConfig(batch_size=32, epochs=2, n_train_samples=(4, 3),
                          n_val_samples=(4, 3), output_dims=(16, 16))
        _, _, hist = fit(problem, cfg, log=lambda d: None)
        assert np.isfinite(hist[-1]["train_loss"])


def test_combine_add_variant():
    """combine='add' (paper-style single-width output) trains."""
    problem = sbm_problem(n_nodes=300, n_classes=3, feat_dim=16, seed=46)
    cfg = TrainConfig(batch_size=32, epochs=3, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), combine="add")
    _, _, hist = fit(problem, cfg, log=lambda d: None)
    assert hist[-1]["val_metric"] > 0.5


def test_no_normalize_variant():
    problem = sbm_problem(n_nodes=300, n_classes=3, feat_dim=16, seed=47)
    cfg = TrainConfig(batch_size=32, epochs=3, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), normalize=False)
    _, _, hist = fit(problem, cfg, log=lambda d: None)
    assert hist[-1]["val_metric"] > 0.5


def test_capacity_model_sub_slack_budget_reports_zero():
    """An hbm at/below the measured runtime slack has no envelope —
    max_nodes must say 0, not a fabricated 1 (round-5 review finding:
    `--hbm-gb 7` printed 1-node capacity on a device the model says fits
    nothing). The monotonic sanity of the envelope rides along."""
    from tpu_sage.bench.capacity import (CapacityConfig, XLA_SLACK_BYTES,
                                         max_nodes, resident_bytes)

    cfg = CapacityConfig()
    assert max_nodes(cfg, hbm_bytes=7 * 1024**3) == 0      # below slack
    assert max_nodes(cfg, hbm_bytes=XLA_SLACK_BYTES) == 0  # budget == 0
    n16 = max_nodes(cfg, hbm_bytes=16 * 1024**3)
    n32 = max_nodes(cfg, hbm_bytes=32 * 1024**3)
    assert 0 < n16 < n32
    # the bisected point actually fits and its successor does not
    budget = 16 * 1024**3 - XLA_SLACK_BYTES
    assert resident_bytes(n16, cfg) <= budget < resident_bytes(n16 + 1, cfg)
