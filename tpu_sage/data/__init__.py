from tpu_sage.data.problem import NodeProblem
from tpu_sage.data.synthetic import bench_store, sbm_problem, sbm_store

__all__ = ["NodeProblem", "bench_store", "sbm_problem", "sbm_store"]
