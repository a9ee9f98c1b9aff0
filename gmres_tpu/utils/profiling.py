"""Profiling/observability hooks (SURVEY.md §5.1).

The reference's tracing is two chrono spans scraped off stdout; here:
- ``trace(dir)``: jax.profiler device trace around a region (view in
  TensorBoard / xprof);
- ``PhaseTimers``: named wall-clock phases with a structured dict export
  (feeds the JSONL results rather than stdout text);
- ``solve_metrics``: derived solver metrics (nnz/s, iterations/s).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    with jax.profiler.trace(log_dir):
        yield


class PhaseTimers:
    def __init__(self):
        self.seconds: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] = self.seconds.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def as_dict(self) -> dict[str, float]:
        return dict(self.seconds)


def solve_metrics(result, nnz: int) -> dict:
    """Derived metrics for a GmresResult (north-star nnz/s included).
    Each inner iteration does one SpMV over nnz entries (plus the
    preconditioner's sweeps, not counted here)."""
    secs = max(result.solve_seconds, 1e-12)
    return {
        "total_iters": result.total_iters,
        "restarts": result.restarts,
        "converged": result.converged,
        "solve_seconds": result.solve_seconds,
        "prec_seconds": result.prec_seconds,
        "spmv_nnz_per_s": result.total_iters * nnz / secs,
        "iters_per_s": result.total_iters / secs,
    }
