"""Cross-cutting helpers (reference ``helpers.py`` — SURVEY.md §2.1).

``set_seeds`` mirrors the reference helper (numpy + the returned JAX key; JAX
has no global RNG to seed — the key is the seed). ``enable_compilation_cache``
turns on the persistent XLA compile cache so repeated runs skip the multi-
minute remote compile on the axon backend.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def set_seeds(seed: int):
    """Seed numpy and return the root JAX PRNG key (the RNG architecture is
    one threaded key — SURVEY.md §7.3 #2)."""
    import jax

    np.random.seed(seed)
    return jax.random.key(seed)


def to_numpy(x) -> np.ndarray:
    """Device array → host numpy (reference ``helpers.to_numpy``)."""
    return np.asarray(x)


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persistent jit-compile cache. NOT wired in by default: on the axon
    backend a cache populated by an interrupted run made subsequent
    ``bench.py`` executions hang (suspected partial-entry deserialization
    against the remote-compile path). Opt in only on standard backends."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
