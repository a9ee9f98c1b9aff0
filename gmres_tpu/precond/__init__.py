from gmres_tpu.precond.build import build_preconditioner
from gmres_tpu.precond.apply import apply_preconditioner
from gmres_tpu.precond.ilu0 import ilu0_factorize, triangular_level_counts

__all__ = [
    "build_preconditioner",
    "apply_preconditioner",
    "ilu0_factorize",
    "triangular_level_counts",
]
