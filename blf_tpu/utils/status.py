"""Per-lane status codes: failure handling as data, not exceptions.

The reference handles failure with ``bool`` returns + ``std::cerr`` at ~60
sites (SURVEY.md §5 "failure detection"). In a batched device program a lane
cannot throw; status is an int array carried *in* the batch (SURVEY.md §7
"bool + cerr → per-lane status arrays on device"). Host code converts to
exceptions/logs at the boundary.
"""

from __future__ import annotations

from enum import IntEnum
from typing import Dict

import jax.numpy as jnp

__all__ = ["SolverStatus", "classify_qp", "nan_quarantine", "status_counts"]


class SolverStatus(IntEnum):
    """Per-lane solver outcome (BASELINE "converged/maxiter/infeasible")."""

    CONVERGED = 0
    MAX_ITERATIONS = 1
    NUMERICAL_ERROR = 2      # NaN/Inf anywhere in the lane's solution


def classify_qp(qp_solution) -> jnp.ndarray:
    """Map a :class:`blf_tpu.mpc.qp.QPSolution` to per-lane status codes."""
    bad = ~(
        jnp.all(jnp.isfinite(qp_solution.x), axis=-1)
        & jnp.isfinite(qp_solution.primal_residual)
        & jnp.isfinite(qp_solution.dual_residual)
    )
    status = jnp.where(
        bad,
        SolverStatus.NUMERICAL_ERROR,
        jnp.where(qp_solution.converged, SolverStatus.CONVERGED,
                  SolverStatus.MAX_ITERATIONS),
    )
    return status.astype(jnp.int32)


def nan_quarantine(state_tree, status: jnp.ndarray, reset_tree):
    """Replace NaN lanes with reset values (SURVEY.md §5 "NaN quarantine per
    lane"): lanes flagged NUMERICAL_ERROR restart from ``reset_tree`` instead
    of poisoning subsequent ticks. The reset itself is sanitized (non-finite
    reset entries become 0) so quarantine always produces a finite lane even
    when the last-good state was already poisoned."""
    import jax

    bad = (status == SolverStatus.NUMERICAL_ERROR)

    def fix(cur, rst):
        mask = bad.reshape(bad.shape + (1,) * (cur.ndim - bad.ndim))
        rst = jnp.broadcast_to(rst, cur.shape)
        if jnp.issubdtype(rst.dtype, jnp.floating):
            rst = jnp.where(jnp.isfinite(rst), rst, jnp.zeros_like(rst))
        return jnp.where(mask, rst, cur)

    return jax.tree_util.tree_map(fix, state_tree, reset_tree)


def status_counts(status: jnp.ndarray) -> Dict[str, int]:
    """Host-side summary dict for telemetry/logging."""
    return {
        s.name.lower(): int(jnp.sum(status == s)) for s in SolverStatus
    }
