"""Pallas fused-ADMM-stage kernel tests (interpret mode on CPU).

The kernel implements the spectral per-lane-ρ stage of
``solve_qp_factored`` in the transposed (batch-minor) layout, with the
structural ρ folded into the left operator and the per-lane ``s`` hoisted
into the spectral gain (see ``blf_tpu/ops/pallas/admm.py``). ``pallas_f32``
runs the same math as the XLA stage at f32 but with that different
evaluation order, so it is held to ~1e-5 solution agreement (not bit
identity); ``pallas`` (delta-form 2-pass accumulation) and ``pallas_split``
(3-pass split-f32) are held to solution-quality parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blf_tpu.models.lipm import LIPMParams
from blf_tpu.mpc.dcm import build_dcm_qp
from blf_tpu.mpc.qp import factor_shared_qp, solve_qp_factored, solve_qp_shared

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
    def test_f32_mode_matches_xla_backend(self):
        """6-pass f32 kernel runs the XLA stage math with ρ folded into the
        operator and s hoisted into the spectral gain — same fixed point,
        different rounding order, so ~1e-5 agreement (measured 3e-7 on the
        horizon-16 fleet). The kernel never refines, so compare against the
        unrefined XLA path (refine=True is the XLA-only robustness
        default)."""
        P, q, A, l, u = fleet_problem()
        sx = solve_qp_shared(P, q, A, l, u, iterations=100, refine=False)
        sp = solve_qp_shared(P, q, A, l, u, iterations=100,
                             backend="pallas_f32")
        np.testing.assert_allclose(np.asarray(sp.x), np.asarray(sx.x),
                                   atol=1e-5)
        assert abs(int(sp.converged.sum()) - int(sx.converged.sum())) <= 2

    @pytest.mark.parametrize("backend", ["pallas", "pallas_split"])
    def test_reduced_precision_modes_solution_quality(self, backend):
        """'pallas' (delta-form 2-pass) and 'pallas_split' (3-pass split-f32)
        are loose-tolerance modes: product noise ≲2⁻¹⁷ floors residuals near
        1e-5, so they are held to the 1e-4 contract (at 1e-5 split
        demonstrably stalls — that is why f32/refined-XLA are the accuracy
        defaults)."""
        P, q, A, l, u = fleet_problem()
        eps = dict(eps_abs=1e-4, eps_rel=1e-4)
        sx = solve_qp_shared(P, q, A, l, u, iterations=150, **eps)
        sp = solve_qp_shared(P, q, A, l, u, iterations=150, backend=backend,
                             **eps)
        assert int(sp.converged.sum()) >= int(sx.converged.sum()) - 25
        # solutions agree wherever both lanes converged (unconverged lanes
        # may sit on different intermediate iterates)
        both = np.asarray(sp.converged & sx.converged)
        np.testing.assert_allclose(np.asarray(sp.x)[both],
                                   np.asarray(sx.x)[both], atol=5e-4)

    def test_delta_mode_warm_start_floor(self):
        """Delta-form accumulation must not lose accuracy on the production
        pattern (warm-started receding-horizon resolve): starting from the
        refined XLA solution, 50 delta iterations must stay at the solved
        fixed point (the increment-rounding bias resets each stage and is
        bounded by the entering residual — module docstring)."""
        P, q, A, l, u = fleet_problem()
        ref = solve_qp_shared(P, q, A, l, u, iterations=200, refine=False)
        warm = solve_qp_shared(P, q, A, l, u, iterations=50, backend="pallas",
                               x0=ref.x, y0=ref.y, s0=ref.rho_scale)
        # only lanes the reference actually solved pin a fixed point; the
        # few unconverged ill lanes keep moving under EVERY backend
        conv = np.asarray(ref.converged)
        assert conv.sum() >= 250
        np.testing.assert_allclose(np.asarray(warm.x)[conv],
                                   np.asarray(ref.x)[conv], atol=2e-5)
        assert int(warm.converged[conv].sum()) >= int(conv.sum()) - 2

    def test_falls_back_when_batch_not_divisible(self):
        """Non-256-divisible batches silently use the XLA path."""
        P, q, A, l, u = fleet_problem(B=100)
        s = solve_qp_shared(P, q, A, l, u, iterations=50, backend="pallas")
        assert s.x.shape == (100, 4 * N)
        assert np.all(np.isfinite(np.asarray(s.x)))

    def test_stage_kernel_accepts_unaligned_small_batches(self):
        """ADVICE r3 regression: admm_stage at B < 128 / B % 128 != 0 used to
        ZeroDivisionError in the chunk-snap loop; chunks=1 must run the full
        block width instead."""
        from blf_tpu.ops.pallas.admm import admm_stage

        P, q, A, l, u = fleet_problem(B=100)
        is_eq = jnp.all((u - l) < 1e-12, axis=0)
        f = factor_shared_qp(P, A, is_eq)
        m, n = f.A_s.shape
        B = l.shape[0]
        qs = f.c * (q * f.D)
        gq = jnp.broadcast_to(qs @ f.W, (B, n))
        v = jnp.zeros((B, m), DTYPE)
        tau = jnp.zeros((B, n), DTYPE)
        s = jnp.ones((B, 1), DTYPE)
        lb = jnp.broadcast_to(f.E * l, (B, m))
        ub = jnp.broadcast_to(f.E * u, (B, m))
        v2, tau2 = admm_stage(v, tau, s, gq, lb, ub, f.G2, f.d, f.base_rho,
                              iters=10, alpha=1.6)
        assert v2.shape == (B, m) and tau2.shape == (B, n)
        assert np.all(np.isfinite(np.asarray(v2)))

    def test_factored_api_reuses_plant(self):
        """factor once, solve many — the tick-loop shape."""
        P, q, A, l, u = fleet_problem(B=256)
        is_eq = jnp.all((u - l) < 1e-12, axis=0)
        f = factor_shared_qp(P, A, is_eq)
        s1 = solve_qp_factored(f, q, l, u, iterations=100)
        s2 = solve_qp_shared(P, q, A, l, u, iterations=100)
        np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x),
                                   atol=1e-12)
        # warm start (primal, dual, AND adapted ρ) from the previous solve
        # converges at least as well in half the iterations
        s3 = solve_qp_factored(f, q, l, u, iterations=50,
                               x0=s1.x, y0=s1.y, s0=s1.rho_scale)
        assert int(s3.converged.sum()) >= int(s1.converged.sum())
