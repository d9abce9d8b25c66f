"""Task heads: losses by task name (reference ``problem.py`` loss tables).

Reference surface (SURVEY.md §2.1 "Task heads / losses"):
``classification`` → cross-entropy; ``multilabel_classification`` →
BCE-with-logits; ``regression`` → MSE; ``regression_mae`` → L1. All are pure
jnp, mean-reduced over the batch, and differentiable on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Integer-target softmax CE; targets ``(B,)`` int, logits ``(B, C)``."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), targets.astype(jnp.int32)
    ).mean()


def multilabel_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-class sigmoid BCE; targets ``(B, C)`` in {0,1}."""
    logits = logits.astype(jnp.float32)
    return optax.sigmoid_binary_cross_entropy(logits, targets.astype(logits.dtype)).mean()


def mse(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(preds - targets.astype(preds.dtype)))


def mae(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(preds - targets.astype(preds.dtype)))


loss_lookup = {
    "classification": cross_entropy,
    "multilabel_classification": multilabel_bce,
    "regression": mse,
    "regression_mae": mae,
}
