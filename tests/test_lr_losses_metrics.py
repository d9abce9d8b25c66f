"""LR schedule curves vs closed form; loss/metric parity vs torch/sklearn."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from sklearn.metrics import f1_score

from tpu_sage.train.losses import cross_entropy, mae, mse, multilabel_bce
from tpu_sage.train.lr import LRSchedule
from tpu_sage.train.metrics import accuracy, multilabel_micro_f1


# -- LR schedules ----------------------------------------------------------


def test_constant():
    f = LRSchedule.constant(lr_init=0.05)
    assert float(f(0.0)) == pytest.approx(0.05)
    assert float(f(7.3)) == pytest.approx(0.05)


def test_linear():
    f = LRSchedule.linear(lr_init=0.1, epochs=10)
    assert float(f(0.0)) == pytest.approx(0.1)
    assert float(f(5.0)) == pytest.approx(0.05)
    assert float(f(10.0)) == pytest.approx(0.0)
    assert float(f(12.0)) == pytest.approx(0.0)  # clamps


def test_cyclical():
    f = LRSchedule.cyclical(lr_init=0.1, lr_min=0.01, period=2.0)
    assert float(f(0.0)) == pytest.approx(0.1)
    assert float(f(1.0)) == pytest.approx(0.01)  # mid-cycle trough
    assert float(f(2.0)) == pytest.approx(0.1)   # cycle restart


def test_sgdr():
    f = LRSchedule.sgdr(lr_init=0.1, lr_min=0.0, period=10.0, t_mult=2.0)
    assert float(f(0.0)) == pytest.approx(0.1)
    assert float(f(5.0)) == pytest.approx(0.05, abs=1e-6)  # cos(pi/2)
    assert float(f(10.0)) == pytest.approx(0.1)             # restart
    assert float(f(20.0)) == pytest.approx(0.05, abs=1e-6)  # halfway through 2nd (len 20)
    assert float(f(30.0)) == pytest.approx(0.1)             # 2nd restart at 10+20


def test_sgdr_tmult1():
    f = LRSchedule.sgdr(lr_init=0.1, period=5.0, t_mult=1.0)
    assert float(f(5.0)) == pytest.approx(0.1)
    assert float(f(7.5)) == pytest.approx(0.05, abs=1e-6)


# -- losses ---------------------------------------------------------------


def test_cross_entropy_vs_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    targets = rng.integers(0, 5, 16)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(targets)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_bce_vs_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    targets = (rng.random((16, 5)) > 0.5).astype(np.float32)
    ours = float(multilabel_bce(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(
        F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(targets)
        )
    )
    assert ours == pytest.approx(ref, rel=1e-5)


def test_regression_losses():
    p = jnp.asarray([[1.0], [2.0]])
    t = jnp.asarray([[0.0], [4.0]])
    assert float(mse(p, t)) == pytest.approx(2.5)
    assert float(mae(p, t)) == pytest.approx(1.5)


# -- metrics --------------------------------------------------------------


def test_accuracy():
    logits = jnp.asarray([[2.0, 1.0], [0.0, 3.0], [1.0, 0.0]])
    targets = jnp.asarray([0, 1, 1])
    assert float(accuracy(logits, targets)) == pytest.approx(2 / 3)


def test_micro_f1_vs_sklearn():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(64, 7)).astype(np.float32)
    targets = (rng.random((64, 7)) > 0.6).astype(np.float32)
    ours = float(multilabel_micro_f1(jnp.asarray(logits), jnp.asarray(targets)))
    ref = f1_score(targets, (logits > 0).astype(np.float32), average="micro")
    assert ours == pytest.approx(ref, rel=1e-5)
