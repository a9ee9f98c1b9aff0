from gmres_tpu.solver.gmres import solve, GmresResult

__all__ = ["solve", "GmresResult"]
