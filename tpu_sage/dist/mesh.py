"""Device mesh construction (SURVEY.md §5.8).

The reference has no communication layer at all; scaling here is JAX
collectives compiled by XLA over ICI/DCN. One ``data`` axis covers both
data-parallel batching and graph partitioning (each shard owns a node range
*and* the slice of the batch drawn from it); a ``model`` axis can be added for
tensor-parallel aggregator weights (low priority — SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.array(devs).reshape(tuple(shape))
    return Mesh(arr, axis_names)


def axis_size(mesh: Mesh, axis) -> int:
    """Total shard count over one axis name or an axis-name tuple (the
    ``('host', 'chip')`` hierarchical layout shards over the flattened pair,
    linear index ``host·n_chips + chip``)."""
    names = (axis,) if isinstance(axis, str) else tuple(axis)
    size = 1
    for a in names:
        size *= mesh.shape[a]
    return size


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` (SURVEY.md §5.8).

    No-op when single-process (the common case in this environment)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for the data-parallel path."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
