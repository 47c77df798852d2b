"""Pallas fused-ADMM-stage kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blf_tpu.models.lipm import LIPMParams
from blf_tpu.mpc.dcm import build_dcm_qp
from blf_tpu.mpc.qp import solve_qp_shared

N = 16
DTYPE = jnp.float32


def fleet_problem(B=256):
    params = LIPMParams(jnp.asarray(0.9, DTYPE), jnp.asarray(9.81, DTYPE))
    stance = jnp.zeros(2, DTYPE)
    zr = jnp.broadcast_to(stance, (N, 2))
    dr = jnp.broadcast_to(stance, (N + 1, 2))
    pA = jnp.tile(
        jnp.asarray([[1.0, 0], [-1.0, 0], [0, 1.0], [0, -1.0]], DTYPE),
        (N, 1, 1),
    )
    pb = jnp.broadcast_to(jnp.asarray([0.1, 0.1, 0.06, 0.06], DTYPE), (N, 4))
    rng = np.random.default_rng(0)
    dcm0s = jnp.asarray(rng.normal(0, 0.02, (B, 2)), DTYPE)
    return build_dcm_qp(params, 0.1, dcm0s, dr, zr, pA, pb)


class TestPallasBackend:
    def test_matches_xla_backend(self):
        """The fused kernel must reproduce the XLA stage math exactly
        (interpret mode is bit-identical; on TPU the orders differ by ~1e-6)."""
        P, q, A, l, u = fleet_problem()
        sx = solve_qp_shared(P, q, A, l, u, iterations=100)
        sp = solve_qp_shared(P, q, A, l, u, iterations=100, backend="pallas")
        tol = 0.0 if jax.default_backend() == "cpu" else 1e-5
        np.testing.assert_allclose(np.asarray(sp.x), np.asarray(sx.x), atol=tol)
        assert int(sp.converged.sum()) == int(sx.converged.sum())

    def test_norefine_flag_plumbs_through(self):
        P, q, A, l, u = fleet_problem(B=256)
        s1 = solve_qp_shared(P, q, A, l, u, iterations=50, backend="pallas",
                             refine=False)
        s2 = solve_qp_shared(P, q, A, l, u, iterations=50, refine=False)
        np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x), atol=1e-7)

    def test_falls_back_when_batch_not_divisible(self):
        """Non-256-divisible batches silently use the XLA path."""
        P, q, A, l, u = fleet_problem(B=100)
        s = solve_qp_shared(P, q, A, l, u, iterations=50, backend="pallas")
        assert s.x.shape == (100, 4 * N)
        assert np.all(np.isfinite(np.asarray(s.x)))
