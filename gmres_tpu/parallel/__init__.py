from gmres_tpu.parallel.partition import PartitionedCSR, partition_rows, pad_vector
from gmres_tpu.parallel.dist_gmres import solve_distributed

__all__ = ["PartitionedCSR", "partition_rows", "pad_vector", "solve_distributed"]
