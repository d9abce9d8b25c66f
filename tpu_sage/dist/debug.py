"""Cross-host/replica divergence checks (SURVEY.md §5.2).

JAX's functional model has no data races; the distributed failure mode that
remains is *replica divergence* — params or step counters drifting across
processes after a resume or a non-deterministic reduction. These helpers are
cheap enough to run every N steps in debug mode.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def tree_fingerprint(tree: Any) -> jnp.ndarray:
    """Order-stable scalar fingerprint of a pytree (sum of per-leaf means) —
    one float per replica to compare, not the whole state."""
    leaves = [jnp.mean(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.number)]
    return jnp.stack(leaves).sum()


def assert_replicas_equal(x: Any, name: str = "value") -> None:
    """Multi-process: assert every process holds the same value.

    Single-process (the common case here) this is a no-op; under
    ``jax.distributed`` it all-gathers a fingerprint and raises on drift.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    fp = np.asarray(tree_fingerprint(x))
    gathered = multihost_utils.process_allgather(fp)
    if not np.allclose(gathered, gathered[0], rtol=1e-6, atol=1e-8):
        raise AssertionError(
            f"replica divergence in {name}: fingerprints {gathered.tolist()}"
        )
