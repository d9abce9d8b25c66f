from tpu_sage.sample.sampler import (
    UniformNeighborSampler,
    sample_tree,
    sampler_lookup,
    uniform_neighbor_sample,
)

__all__ = [
    "UniformNeighborSampler",
    "sample_tree",
    "sampler_lookup",
    "uniform_neighbor_sample",
]
