"""Restart/convergence policy state.

The reference implements policies as a virtual-dispatch ``Convergence``
class hierarchy consulted from host code every inner iteration
(``IterUtil.hpp:17-227``, ``gmres.cpp:113-115``).  On TPU that per-iteration
host round-trip would dominate; here every policy is an **on-device
predicate** inside the jitted restart cycle (see ``solver/gmres.py``), and
only the small cross-restart state below round-trips between cycles (without
host synchronization — the arrays are passed straight back in).

Policy semantics reproduced exactly:

- FIXED (``Convergence``): restart when ``restart_length <= k+1``
  (``IterUtil.hpp:57-65``).  Note that ``check_initial`` increments the
  restart counter *before* testing convergence, so ``max_restarts`` bounds
  outer iterations including the final converged one (``IterUtil.hpp:42-51``
  — quirk §2.5.6, replicated in the host driver).
- REL_PREC_RES (``RelPrecRes_Convergence``): additionally restart when the
  Arnoldi residual proxy ``|s(k+1)|/||M^{-1}b||`` drops below
  ``restart_improvement`` times this cycle's initial preconditioned
  relative residual (``IterUtil.hpp:150-165``).
- REPEAT_ITERATION (``RepeatIteration_Convergence``): like REL_PREC_RES but
  the threshold is frozen from the *first* cycle, and after the first
  restart triggers, later cycles restart at the recorded first-cycle length
  (``IterUtil.hpp:84-137``).
- LOST_ORTHOGONALITY (``LostOrthogonality_Convergence``): tracks the
  orthogonality-loss recurrence ``s_col = u - S u`` with
  ``u = V_{0:k+1}^T v_{k+1}``, restarting when the accumulated squared loss
  reaches ``restart_improvement^2`` (``IterUtil.hpp:172-227``).  The S
  matrix is per-cycle state (every entry read in a cycle is written earlier
  in the same cycle; column 0 is never written and stays zero).

Mid-cycle ``iteration_converged`` is dead code in the reference (no policy
returns it from ``check``; convergence is only detected at restart
boundaries via ``check_initial`` — SURVEY.md §2.2) and is intentionally not
implemented.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PolicyState(NamedTuple):
    """Cross-restart policy state (REPEAT_ITERATION; unused otherwise)."""

    is_first: jax.Array          # bool: no restart has triggered yet
    second_restart_length: jax.Array  # int32: inner length recorded at first restart
    restart_tol: jax.Array       # float64: frozen first-cycle threshold


def initial_policy_state() -> PolicyState:
    return PolicyState(
        is_first=jnp.asarray(True),
        second_restart_length=jnp.asarray(0, dtype=jnp.int32),
        restart_tol=jnp.asarray(0.0, dtype=jnp.float64),
    )
