"""Metrics by task, computed on device from count statistics.

The reference computes F1 with sklearn on host every batch (SURVEY.md §3.5).
Here the confusion counts (tp/fp/fn, correct/total) accumulate on device —
one scalar transfer at logging points instead of a per-step host sync
(SURVEY.md §5.5). ``micro_f1`` on thresholded logits (> 0) matches the
reference's multilabel protocol; for single-label tasks micro-F1 equals
accuracy, which is what we report there.
"""

from __future__ import annotations

import jax.numpy as jnp


def accuracy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(logits, axis=-1) == targets.astype(jnp.int32)).astype(jnp.float32))


def multilabel_micro_f1(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Micro-F1 over thresholded logits (> 0 ⇔ sigmoid > 0.5), matching the
    reference's ``predictions > 0`` protocol (SURVEY.md §3.5)."""
    preds = (logits > 0).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    tp = jnp.sum(preds * t)
    fp = jnp.sum(preds * (1.0 - t))
    fn = jnp.sum((1.0 - preds) * t)
    return 2.0 * tp / jnp.maximum(2.0 * tp + fp + fn, 1e-12)


def neg_mse(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(jnp.square(preds - targets.astype(preds.dtype)))


def neg_mae(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(jnp.abs(preds - targets.astype(preds.dtype)))


metric_lookup = {
    "classification": accuracy,
    "multilabel_classification": multilabel_micro_f1,
    "regression": neg_mse,
    "regression_mae": neg_mae,
}
