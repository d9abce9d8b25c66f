"""tpu_sage — a TPU-native GraphSAGE framework.

A from-scratch re-design of the capability surface of ``bkj/pytorch-graphsage``
(reference layout: flat repo with ``train.py`` / ``models.py`` / ``nn_modules.py``
/ ``problem.py`` / ``lr.py`` / ``convert.py``; see SURVEY.md §1-2) for TPU:

- the graph lives device-resident as a padded fixed-max-degree neighbor table
  (static shapes end-to-end — every op compiles onto the MXU/VPU once),
- neighbor sampling is an on-device gather driven by ``jax.random`` (no
  host↔device traffic in the hot loop),
- aggregators are flax modules whose math XLA fuses (gather + matmul +
  fanout-axis reduction),
- multi-chip scaling is ``jax.sharding`` + ``shard_map`` halo exchange over an
  ICI/DCN mesh, not a sockets library.

Public API mirrors the reference's registries and flag names where reasonable
so run scripts translate ~1:1 (SURVEY.md §5.6).
"""

__version__ = "0.1.0"

from tpu_sage.graph.graph_data import DeviceGraph, GraphStore, build_padded_adjacency
from tpu_sage.data.problem import NodeProblem
from tpu_sage.sample.sampler import UniformNeighborSampler, uniform_neighbor_sample, sample_tree
from tpu_sage.nn.preps import prep_lookup
from tpu_sage.nn.aggregators import aggregator_lookup
from tpu_sage.nn.model import GSSupervised, LayerSpec
from tpu_sage.train.lr import LRSchedule

__all__ = [
    "DeviceGraph",
    "GraphStore",
    "build_padded_adjacency",
    "NodeProblem",
    "UniformNeighborSampler",
    "uniform_neighbor_sample",
    "sample_tree",
    "prep_lookup",
    "aggregator_lookup",
    "GSSupervised",
    "LayerSpec",
    "LRSchedule",
]
