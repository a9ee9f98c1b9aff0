from gmres_tpu.ops.spmv import spmv
from gmres_tpu.ops.blas import dot, nrm2, nrm2_squared

__all__ = ["spmv", "dot", "nrm2", "nrm2_squared"]
