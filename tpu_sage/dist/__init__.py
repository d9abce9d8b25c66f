from tpu_sage.dist.halo import (dist_gather, dist_gather_bucketed,
                                dist_gather_ring)
from tpu_sage.dist.mesh import data_sharding, make_mesh, replicated
from tpu_sage.dist.partition import shard_fold, shard_graph
from tpu_sage.dist.train import PartitionedTrainer, fit_partitioned
from tpu_sage.dist.unsupervised import (PartitionedUnsupervisedTrainer,
                                        fit_unsupervised_partitioned)

__all__ = [
    "dist_gather",
    "dist_gather_bucketed",
    "dist_gather_ring",
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_graph",
    "shard_fold",
    "PartitionedTrainer",
    "fit_partitioned",
    "PartitionedUnsupervisedTrainer",
    "fit_unsupervised_partitioned",
]
