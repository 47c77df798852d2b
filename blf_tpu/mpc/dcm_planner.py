"""Time-varying DCM planner — the ``TimeVaryingDCMPlanner`` capability.

The reference snapshot predates the upstream ``TimeVaryingDCMPlanner`` but
contains its full substrate (SURVEY.md intro), and BASELINE.json's north star
is exactly this planner class: the CasADi/Ipopt optimal-control transcription
becomes a batched SQP in JAX (:mod:`blf_tpu.mpc.sqp`). Formulation (matching
the upstream planner's constraint set):

- state ``x = (ξ ∈ ℝ³, ω)`` — 3-D divergent component of motion and the
  time-varying natural frequency;
- control ``u = (z ∈ ℝ², ω̇)`` — ZMP/eCMP ground position and ω-rate;
- VRP ``v = (z_x, z_y, z_ground + g/ω²)`` (the eCMP lifted by the gravity
  offset — the upstream equality ``vrp_z − g/ω² = terrain height`` is
  eliminated structurally instead of imposed);
- DCM flow ``ξ̇ = α (ξ − v)`` with ``α = ω − ω̇/ω``, discretized *exactly*
  over each knot interval (ZOH on ``u``, α frozen): ``ξ⁺ = v + e^{α dt}(ξ−v)``
  — for ω̇ = 0 this reduces bit-for-bit to
  :func:`blf_tpu.models.lipm.dcm_discrete_step`;
- inequality constraints: per-knot support polygon ``A_k z ≤ b_k`` (fixed
  padded row count, from :mod:`blf_tpu.planners.gait` /
  :mod:`blf_tpu.planners.convex_hull`), ω bounds, and ``ω̇ ≤ ω² − ε`` keeping
  the flow direction well-defined (α > 0);
- cost: ZMP tracking of the footstep reference, ω regularization to the
  nominal LIPM frequency, ω̇ smoothness, optional DCM-reference tracking, and
  a terminal residual pinning ``(ξ_T, ω_T)`` to the capture state over the
  final foothold.

Everything is fixed-shape and fixed-iteration; batch scenarios with
``jax.vmap`` (see :func:`plan_time_varying_dcm_batch`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from blf_tpu.models.lipm import LIPMParams, lipm_omega
from blf_tpu.mpc.sqp import SQPConfig, solve_trajopt

__all__ = [
    "DCMPlannerWeights",
    "DCMPlannerLimits",
    "DCMPlannerSolution",
    "plan_time_varying_dcm",
    "plan_time_varying_dcm_batch",
    "com_from_dcm_omega",
]


class DCMPlannerWeights(NamedTuple):
    zmp_tracking: float = 10.0
    omega_tracking: float = 1.0
    omega_dot: float = 1.0
    dcm_tracking: float = 0.0      # optional pull toward a seed DCM reference
    terminal_dcm: float = 100.0
    terminal_omega: float = 10.0


class DCMPlannerLimits(NamedTuple):
    omega_min: float = 0.5
    omega_max: float = 10.0
    alpha_margin: float = 0.1      # ω̇ ≤ ω² − margin


class DCMPlannerSolution(NamedTuple):
    dcm: jnp.ndarray        # (T+1, 3)
    omega: jnp.ndarray      # (T+1,)
    zmp: jnp.ndarray        # (T, 2)
    omega_dot: jnp.ndarray  # (T,)
    vrp: jnp.ndarray        # (T, 3)
    cost: jnp.ndarray
    max_violation: jnp.ndarray
    converged: jnp.ndarray


def _dcm_step(x, u, dt, gravity, z_ground):
    """Exact one-knot flow of ``ξ̇ = α(ξ − v)``, ``ω̇`` ZOH."""
    xi, omega = x[:3], x[3]
    zmp, omega_dot = u[:2], u[2]
    alpha = omega - omega_dot / omega
    vrp = jnp.concatenate(
        [zmp, jnp.atleast_1d(z_ground + gravity / (omega * omega))]
    )
    xi_next = vrp + jnp.exp(alpha * dt) * (xi - vrp)
    omega_next = omega + dt * omega_dot
    return jnp.concatenate([xi_next, jnp.atleast_1d(omega_next)])


def plan_time_varying_dcm(
    params: LIPMParams,
    dt: float,
    dcm0: jnp.ndarray,          # (3,) initial DCM (z component = ξ_z)
    omega0: jnp.ndarray,        # scalar initial ω
    zmp_ref: jnp.ndarray,       # (T, 2) footstep/ZMP reference
    poly_A: jnp.ndarray,        # (T, M, 2) support polygon normals
    poly_b: jnp.ndarray,        # (T, M) offsets (A z ≤ b)
    dcm_goal: jnp.ndarray,      # (3,) terminal capture DCM
    *,
    dcm_ref: Optional[jnp.ndarray] = None,  # (T+1, 3) optional seed
    weights: DCMPlannerWeights = DCMPlannerWeights(),
    limits: DCMPlannerLimits = DCMPlannerLimits(),
    z_ground: float = 0.0,
    # AL ladder starts soft (10 → 1e5 over 5 rounds): a stiff start
    # (penalty_init=100) diverges in f32 when the seed is far from feasible
    # — the standard AL failure mode, caught by the f32 test lane.
    sqp: SQPConfig = SQPConfig(iterations=10, al_iterations=5,
                               penalty_init=10.0),
) -> DCMPlannerSolution:
    """Plan a (T-knot) time-varying DCM/ω/ZMP trajectory. Pure; vmap to batch."""
    dtype = zmp_ref.dtype
    T = zmp_ref.shape[0]
    g = params.gravity
    omega_nom = lipm_omega(params)
    w = weights

    def dynamics(x, u, k):
        return _dcm_step(x, u, dt, g, z_ground)

    sw_zmp = jnp.sqrt(jnp.asarray(w.zmp_tracking, dtype))
    sw_om = jnp.sqrt(jnp.asarray(w.omega_tracking, dtype))
    sw_omd = jnp.sqrt(jnp.asarray(w.omega_dot, dtype))
    sw_dcm = jnp.sqrt(jnp.asarray(w.dcm_tracking, dtype))
    sw_tdcm = jnp.sqrt(jnp.asarray(w.terminal_dcm, dtype))
    sw_tom = jnp.sqrt(jnp.asarray(w.terminal_omega, dtype))
    have_dcm_ref = dcm_ref is not None
    dcm_ref_arr = (
        jnp.asarray(dcm_ref, dtype) if have_dcm_ref
        else jnp.zeros((T + 1, 3), dtype)
    )

    def running_residuals(x, u, k):
        res = [
            sw_zmp * (u[:2] - zmp_ref[k]),
            jnp.atleast_1d(sw_om * (x[3] - omega_nom)),
            jnp.atleast_1d(sw_omd * u[2]),
        ]
        if have_dcm_ref:
            res.append(sw_dcm * (x[:3] - dcm_ref_arr[k]))
        return jnp.concatenate(res)

    def terminal_residuals(x):
        return jnp.concatenate([
            sw_tdcm * (x[:3] - dcm_goal),
            jnp.atleast_1d(sw_tom * (x[3] - omega_nom)),
        ])

    def inequality(x, u, k):
        omega, omega_dot = x[3], u[2]
        zmp = u[:2]
        poly = jnp.matmul(poly_A[k], zmp[:, None],
                          precision=jax.lax.Precision.HIGHEST)[:, 0] - poly_b[k]
        bounds = jnp.stack([
            limits.omega_min - omega,
            omega - limits.omega_max,
            omega_dot - (omega * omega - limits.alpha_margin),
        ])
        return jnp.concatenate([poly, bounds])

    x0 = jnp.concatenate(
        [jnp.asarray(dcm0, dtype), jnp.atleast_1d(jnp.asarray(omega0, dtype))]
    )
    us_init = jnp.concatenate(
        [zmp_ref, jnp.zeros((T, 1), dtype)], axis=-1
    )

    sol = solve_trajopt(
        dynamics, running_residuals, terminal_residuals, x0, us_init,
        inequality=inequality, config=sqp,
    )
    omega_traj = sol.states[:, 3]
    vrp = jnp.concatenate(
        [sol.controls[:, :2],
         z_ground + g / (omega_traj[:-1] ** 2)[:, None]], axis=-1,
    )
    return DCMPlannerSolution(
        dcm=sol.states[:, :3], omega=omega_traj, zmp=sol.controls[:, :2],
        omega_dot=sol.controls[:, 2], vrp=vrp, cost=sol.cost,
        max_violation=sol.max_violation, converged=sol.converged,
    )


def plan_time_varying_dcm_batch(params, dt, dcm0, omega0, zmp_ref, poly_A,
                                poly_b, dcm_goal, **kwargs):
    """vmap over leading batch axes of ``dcm0``/``omega0`` (shared plan data)."""
    return jax.vmap(
        lambda d0, o0: plan_time_varying_dcm(
            params, dt, d0, o0, zmp_ref, poly_A, poly_b, dcm_goal, **kwargs
        )
    )(dcm0, omega0)


def com_from_dcm_omega(com0, dcm, omega, dt):
    """Integrate the stable CoM flow ``ċ = ω(ξ − c)`` along a planned
    ``(ξ, ω)`` trajectory (exact per-knot exponential with ξ, ω frozen).

    com0: (..., 3); dcm: (..., T+1, 3); omega: (..., T+1) → (..., T+1, 3).
    """
    xis = jnp.moveaxis(dcm[..., :-1, :], -2, 0)
    oms = jnp.moveaxis(omega[..., :-1], -1, 0)

    def body(c, inp):
        xi, om = inp
        decay = jnp.exp(-om * dt)[..., None]
        c_next = xi + decay * (c - xi)
        return c_next, c_next

    com0 = com0 + 0.0 * xis[0] + 0.0 * oms[0][..., None]
    _, cs = jax.lax.scan(body, com0, (xis, oms))
    return jnp.concatenate(
        [com0[..., None, :], jnp.moveaxis(cs, 0, -2)], axis=-2
    )
