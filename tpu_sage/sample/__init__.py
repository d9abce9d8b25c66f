from tpu_sage.sample.csr import (
    CSRNeighborSampler,
    csr_from_padded,
    sample_tree_csr,
    uniform_neighbor_sample_csr,
)
from tpu_sage.sample.sampler import (
    UniformNeighborSampler,
    sample_tree,
    sampler_lookup,
    uniform_neighbor_sample,
)

sampler_lookup["csr_neighbor_sampler"] = CSRNeighborSampler

__all__ = [
    "UniformNeighborSampler",
    "CSRNeighborSampler",
    "csr_from_padded",
    "sample_tree",
    "sample_tree_csr",
    "sampler_lookup",
    "uniform_neighbor_sample",
    "uniform_neighbor_sample_csr",
]
