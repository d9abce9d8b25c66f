"""Pure data-parallel training: replicated graph, batch sharded over ``data``.

The light-weight multi-chip path (SURVEY.md §2.3 "Data parallel"): when the
graph fits in every chip's HBM, shard only the batch axis and let GSPMD insert
the gradient all-reduce. No shard_map, no halo exchange — one NamedSharding
on the batch ids/targets does it. For graphs too big to replicate, use
``tpu_sage.dist.train.PartitionedTrainer`` instead.

Tensor parallelism (SURVEY.md §2.3 "TP") rides the same jit: pass
``model_axis`` and aggregator/classifier weight matrices get sharded
``P(None, 'model')`` via ``param_shardings``; GSPMD partitions the matmuls.
GraphSAGE layers are small, so this matters only for very wide hidden dims —
provided for completeness.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_sage.graph.graph_data import DeviceGraph
from tpu_sage.train.trainer import TrainConfig, Trainer, TrainState


def param_shardings(params: Any, mesh: Mesh, model_axis: Optional[str]) -> Any:
    """PartitionSpecs for the param tree: 2-D kernels shard their output dim
    over ``model_axis`` (``P(None, 'model')``); everything else replicated.

    The rule is purely path-based (leaf key ``kernel`` + ndim 2), so it applies
    verbatim to the OPTIMIZER state too: optax's ``mu``/``nu`` moment trees
    embed the param tree's dict structure, so a kernel's moments get the same
    ``P(None, model)`` placement as the kernel itself — adam stays fully
    TP-sharded, no replicated moment copies."""

    def spec_for(path, leaf):
        if (
            model_axis is not None
            and hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and path and getattr(path[-1], "key", "") == "kernel"
        ):
            return NamedSharding(mesh, P(None, model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


class DataParallelTrainer(Trainer):
    """Trainer whose step shards the batch over the mesh's ``data`` axis.

    Uses the parent's jit'd step functions unchanged — parallelism comes
    entirely from input shardings (params/graph replicated or TP-sharded,
    batch sharded); XLA adds the psum for the gradients.
    """

    def __init__(self, *args, mesh: Mesh, data_axis: str = "data",
                 model_axis: Optional[str] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh
        self.data_axis = data_axis
        self.model_axis = model_axis

    def shard_inputs(
        self, state: TrainState, graph: DeviceGraph,
        ids: jnp.ndarray, targets: jnp.ndarray,
    ) -> Tuple[TrainState, DeviceGraph, jnp.ndarray, jnp.ndarray]:
        """Place state (replicated / TP), graph (replicated), batch (sharded)."""
        rep = NamedSharding(self.mesh, P())
        batch = NamedSharding(self.mesh, P(self.data_axis))
        p_sharding = param_shardings(state.params, self.mesh, self.model_axis)
        o_sharding = param_shardings(state.opt_state, self.mesh, self.model_axis)
        state = TrainState(
            params=jax.device_put(state.params, p_sharding),
            opt_state=jax.device_put(state.opt_state, o_sharding),
            step=jax.device_put(state.step, rep),
            key=jax.device_put(state.key, rep),
        )
        graph = jax.device_put(graph, rep)
        return (
            state,
            graph,
            jax.device_put(ids, batch),
            jax.device_put(targets, batch),
        )
