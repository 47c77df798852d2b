"""DCM-MPC end-to-end tests — BASELINE config 1 acceptance.

"Single LIPM/DCM step plan: fixed 2-footstep sequence, 1.5 s horizon", DCM
trajectory RMSE ≤ 1e-3 m against an independent CPU reference solve of the
same transcription (scipy SLSQP standing in for Ipopt; BASELINE.md rows 9-10).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tol

from blf_tpu.models.lipm import (
    LIPMParams,
    com_trajectory_from_dcm,
    dcm_backward_recursion,
    dcm_discrete_step,
    lipm_omega,
)
from blf_tpu.mpc.dcm import DCMWeights, build_dcm_qp, solve_dcm_mpc

PARAMS = LIPMParams(com_height=jnp.asarray(0.9), gravity=jnp.asarray(9.81))
DT = 0.1
N = 15  # 1.5 s horizon


def foot_polygon(center, half_l=0.07, half_w=0.04):
    """Axis-aligned foot rectangle as 4 half-spaces (A z ≤ b)."""
    A = np.array([[1.0, 0], [-1.0, 0], [0, 1.0], [0, -1.0]])
    b = np.array(
        [center[0] + half_l, -(center[0] - half_l),
         center[1] + half_w, -(center[1] - half_w)]
    )
    return A, b


def two_step_problem():
    """Fixed 2-footstep sequence: stand on (0, -0.1), step to (0.2, 0.1)."""
    footholds = np.array([[0.0, -0.1], [0.2, 0.1]])
    zmp_ref = np.repeat(footholds, [8, 7], axis=0)                # (N, 2)
    dcm_ref = dcm_backward_recursion(
        PARAMS, jnp.asarray(zmp_ref), jnp.asarray(footholds[-1]), DT
    )
    polys = [foot_polygon(zmp_ref[k]) for k in range(N)]
    poly_A = jnp.asarray(np.stack([p[0] for p in polys]))          # (N, 4, 2)
    poly_b = jnp.asarray(np.stack([p[1] for p in polys]))          # (N, 4)
    dcm0 = jnp.array([0.0, -0.05])
    com0 = jnp.array([0.0, -0.05])
    return dcm0, com0, dcm_ref, jnp.asarray(zmp_ref), poly_A, poly_b


def scipy_reference(P, q, A, l, u):
    """Independent solve of the same QP (stand-in for the Ipopt reference)."""
    from scipy.optimize import minimize

    P, q, A, l, u = (np.asarray(v, dtype=np.float64)
                     for v in (P, q, A, l, u))
    eq = (u - l) < 1e-12
    Aeq, beq, Ain, uin = A[eq], u[eq], A[~eq], u[~eq]
    cons = [
        {"type": "ineq", "fun": lambda x: uin - Ain @ x, "jac": lambda x: -Ain},
        {"type": "eq", "fun": lambda x: Aeq @ x - beq, "jac": lambda x: Aeq},
    ]
    res = minimize(
        lambda x: 0.5 * x @ P @ x + q @ x,
        np.zeros_like(q),
        jac=lambda x: P @ x + q,
        constraints=cons,
        method="SLSQP",
        options={"maxiter": 1000, "ftol": 1e-14},
    )
    assert res.success, res.message
    return res.x


class TestLIPMModel:
    def test_omega(self):
        np.testing.assert_allclose(
            float(lipm_omega(PARAMS)), np.sqrt(9.81 / 0.9), rtol=tol(1e-12, 1e-6)
        )

    def test_discrete_step_matches_ode(self):
        """Exact ZOH vs dense numerical integration of ξ̇ = ω(ξ − z)."""
        from scipy.integrate import solve_ivp

        w = float(lipm_omega(PARAMS))
        xi0, z = np.array([0.1, -0.02]), np.array([0.05, 0.0])
        ref = solve_ivp(
            lambda t, xi: w * (xi - z), (0, DT), xi0, rtol=1e-12, atol=1e-12
        ).y[:, -1]
        ours = dcm_discrete_step(PARAMS, jnp.asarray(xi0), jnp.asarray(z), DT)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=tol(1e-9, 1e-6))

    def test_com_converges_to_dcm_fixed_point(self):
        """Constant ZMP = DCM ⇒ CoM converges exponentially to the DCM."""
        z = jnp.array([0.05, 0.0])
        dcm = jnp.tile(z, (41, 1))
        com = com_trajectory_from_dcm(PARAMS, jnp.array([0.3, 0.2]), dcm, dcm[:-1], DT)
        np.testing.assert_allclose(np.asarray(com[-1]), np.asarray(z), atol=1e-3)

    def test_backward_recursion_terminal(self):
        _, _, dcm_ref, zmp_ref, *_ = two_step_problem()
        np.testing.assert_allclose(np.asarray(dcm_ref[-1]), [0.2, 0.1],
                                   atol=tol(1e-12, 1e-6))
        # the recursion satisfies the forward dynamics: ξ_{k+1} = a ξ_k + (1-a) z_k
        a = np.exp(float(lipm_omega(PARAMS)) * DT)
        fwd = a * np.asarray(dcm_ref[:-1]) + (1 - a) * np.asarray(zmp_ref)
        np.testing.assert_allclose(fwd, np.asarray(dcm_ref[1:]),
                                   atol=tol(1e-10, 1e-6), rtol=tol(1e-7, 1e-5))


class TestDCMMPC:
    def test_plan_respects_polygons(self):
        dcm0, com0, dcm_ref, zmp_ref, poly_A, poly_b = two_step_problem()
        plan = solve_dcm_mpc(PARAMS, DT, dcm0, com0, dcm_ref, zmp_ref,
                             poly_A, poly_b, iterations=400)
        assert bool(plan.qp.converged)
        margins = np.einsum("kfa,ka->kf", np.asarray(poly_A), np.asarray(plan.zmp))
        assert np.all(margins <= np.asarray(poly_b) + 1e-6)

    def test_dcm_rmse_vs_scipy_reference(self):
        """The config-1 acceptance: our batched ADMM plan vs an independent
        CPU solver on the same transcription — DCM RMSE ≤ 1e-3 m."""
        dcm0, com0, dcm_ref, zmp_ref, poly_A, poly_b = two_step_problem()
        P, q, A, l, u = build_dcm_qp(PARAMS, DT, dcm0, dcm_ref, zmp_ref,
                                     poly_A, poly_b)
        x_ref = scipy_reference(P, q, A, l, u)
        zmp_ref_sol = np.stack([x_ref[2 * N:3 * N], x_ref[3 * N:]], axis=-1)

        plan = solve_dcm_mpc(PARAMS, DT, dcm0, com0, dcm_ref, zmp_ref,
                             poly_A, poly_b, iterations=400)
        # DCM trajectories induced by both ZMP plans
        a = np.exp(float(lipm_omega(PARAMS)) * DT)
        def rollout(z):
            xi = np.asarray(dcm0)
            out = [xi]
            for k in range(N):
                xi = a * xi + (1 - a) * z[k]
                out.append(xi)
            return np.stack(out)

        rmse = np.sqrt(np.mean(
            (rollout(np.asarray(plan.zmp)) - rollout(zmp_ref_sol)) ** 2
        ))
        assert rmse <= 1e-3, rmse
        np.testing.assert_allclose(np.asarray(plan.zmp), zmp_ref_sol, atol=5e-3)

    def test_terminal_dcm_reaches_last_foothold(self):
        dcm0, com0, dcm_ref, zmp_ref, poly_A, poly_b = two_step_problem()
        plan = solve_dcm_mpc(PARAMS, DT, dcm0, com0, dcm_ref, zmp_ref,
                             poly_A, poly_b, iterations=400)
        np.testing.assert_allclose(
            np.asarray(plan.dcm[-1]), [0.2, 0.1], atol=0.02
        )

    def test_com_follows_within_footprint_band(self):
        dcm0, com0, dcm_ref, zmp_ref, poly_A, poly_b = two_step_problem()
        plan = solve_dcm_mpc(PARAMS, DT, dcm0, com0, dcm_ref, zmp_ref,
                             poly_A, poly_b, iterations=400)
        com = np.asarray(plan.com)
        assert com[:, 0].max() <= 0.2 + 0.08
        assert com[:, 0].min() >= -0.08
        assert np.all(np.isfinite(com))

    def test_unreachable_reference_saturates_constraints(self):
        """A DCM reference far outside the footprints must drive the ZMP to the
        polygon boundary, not through it."""
        dcm0, com0, dcm_ref, zmp_ref, poly_A, poly_b = two_step_problem()
        plan = solve_dcm_mpc(
            PARAMS, DT, dcm0 + 1.0, com0, dcm_ref + 1.0, zmp_ref,
            poly_A, poly_b, iterations=400,
        )
        margins = np.einsum("kfa,ka->kf", np.asarray(poly_A), np.asarray(plan.zmp))
        assert np.all(margins <= np.asarray(poly_b) + tol(1e-6, 5e-4))
        # at least one knot rides the boundary
        assert np.any(np.asarray(poly_b) - margins < 1e-4)


class TestBatchedMPC:
    def test_vmap_scenario_sweep(self):
        """A push-recovery-style sweep: 64 initial DCM perturbations solved in
        one jitted batch — the BASELINE config-5 pattern in miniature."""
        dcm0, com0, dcm_ref, zmp_ref, poly_A, poly_b = two_step_problem()
        rng = np.random.default_rng(3)
        dcm0s = jnp.asarray(dcm0 + rng.uniform(-0.05, 0.05, size=(64, 2)))

        solve = jax.jit(jax.vmap(
            lambda d0: solve_dcm_mpc(PARAMS, DT, d0, com0, dcm_ref, zmp_ref,
                                     poly_A, poly_b, iterations=1000,
                                     eps_abs=tol(1e-5, 1e-4),
                                     eps_rel=tol(1e-5, 1e-4))
        ))
        plans = solve(dcm0s)
        assert plans.zmp.shape == (64, N, 2)
        assert int(plans.qp.converged.sum()) >= tol(64, 60)
        solo = solve_dcm_mpc(PARAMS, DT, dcm0s[11], com0, dcm_ref, zmp_ref,
                             poly_A, poly_b, iterations=1000)
        np.testing.assert_allclose(
            np.asarray(plans.zmp[11]), np.asarray(solo.zmp),
            atol=tol(1e-10, 1e-6)
        )

    def test_receding_horizon_warm_start(self):
        """Replan after one step using the previous plan + duals as warm start:
        identity warm-starting preserves convergence instantly, and on the
        shifted problem the warm solve is closer to the new optimum than a
        cold solve at the same iteration budget (the production MPC loop)."""
        dcm0, com0, dcm_ref, zmp_ref, poly_A, poly_b = two_step_problem()
        plan = solve_dcm_mpc(PARAMS, DT, dcm0, com0, dcm_ref, zmp_ref,
                             poly_A, poly_b, iterations=400)
        # identity warm start: stays at the fixed point in a handful of iters
        warm_id = solve_dcm_mpc(
            PARAMS, DT, dcm0, com0, dcm_ref, zmp_ref, poly_A, poly_b,
            iterations=25, warm_start=plan.zmp, warm_start_dual=plan.qp.y,
            eps_abs=tol(1e-5, 1e-4), eps_rel=tol(1e-5, 1e-4),
        )
        assert bool(warm_id.qp.converged)
        np.testing.assert_allclose(
            np.asarray(warm_id.zmp), np.asarray(plan.zmp),
            atol=tol(1e-6, 1e-5)
        )

        # advance one knot and replan
        dcm1 = dcm_discrete_step(PARAMS, dcm0, plan.zmp[0], DT)
        exact = solve_dcm_mpc(PARAMS, DT, dcm1, com0, dcm_ref, zmp_ref,
                              poly_A, poly_b, iterations=2000)
        budget = 100
        cold = solve_dcm_mpc(PARAMS, DT, dcm1, com0, dcm_ref, zmp_ref,
                             poly_A, poly_b, iterations=budget)
        warm = solve_dcm_mpc(
            PARAMS, DT, dcm1, com0, dcm_ref, zmp_ref, poly_A, poly_b,
            iterations=budget, warm_start=plan.zmp, warm_start_dual=plan.qp.y,
        )
        err_cold = np.abs(np.asarray(cold.zmp) - np.asarray(exact.zmp)).max()
        err_warm = np.abs(np.asarray(warm.zmp) - np.asarray(exact.zmp)).max()
        assert err_warm <= err_cold * 1.5  # warm never materially worse
        assert float(warm.qp.primal_residual) < 1e-2
