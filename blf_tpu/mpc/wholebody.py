"""Whole-body tracking QP — the 100 Hz inner loop (BASELINE config 4).

Task-space inverse dynamics as one strictly convex QP per control tick,
solved by the batched ADMM of :mod:`blf_tpu.mpc.qp` so thousands of
scenario instances run per chip. Decision vector (via the VariablesHandler
registry, reference ``VariablesHandler.cpp:13-48`` role):

    x = [ν̇ (6+n) | f_c (6 per contact frame) | τ (n)]

Equality rows:
- floating-base dynamics ``M ν̇ − Σ J_cᵀ f_c − S τ = −h`` — the same balance
  the reference's forward dynamics solves (``FloatingBaseSystemDynamics.cpp:
  229-244``), used here in its inverse-dynamics direction;
- per contact frame, EITHER the stance constraint
  ``J_c ν̇ = −J̇_c ν − k_d J_c ν`` (acceleration-level, velocity-damped)
  OR ``f_c = 0`` when inactive — blended by a static-shape activation mask so
  the contact schedule never recompiles (SURVEY.md §7 shape discipline).

Inequality rows (per active contact): unilateral ``f_z ≥ 0``, linearized
friction pyramid ``|f_{x,y}| ≤ μ f_z``, CoP inside the sole rectangle
``|τ_y| ≤ (L/2) f_z``, ``|τ_x| ≤ (W/2) f_z``, yaw friction
``|τ_z| ≤ μ_z f_z``; plus joint torque limits.

Cost: CoM linear-acceleration tracking, base angular-acceleration tracking,
joint posture acceleration tracking, and force/torque regularisation.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from blf_tpu.models.kinematics import KinematicTree, forward_kinematics, frame_jacobian
from blf_tpu.models import rigid_body as rb
from blf_tpu.mpc.qp import QPSolution, solve_qp
from blf_tpu.planners.variables import VariablesHandler

__all__ = ["WholeBodyParams", "WholeBodyTask", "WholeBodySolution",
           "build_wholebody_qp", "solve_wholebody_qp"]


class WholeBodyParams(NamedTuple):
    """Static controller parameters."""

    contact_frames: Tuple[str, ...]
    friction_mu: float = 0.7
    torsional_mu: float = 0.05
    foot_half_length: float = 0.07
    foot_half_width: float = 0.04
    torque_limit: float = 60.0
    stance_damping: float = 20.0      # k_d on the stance velocity residual
    # Task weights: the CoM task must DOMINATE the 23-row posture block or
    # the weighted trade-off leaves a push-proportional realized-CoP gap —
    # measured closed-loop (r4): at w_com=10/w_posture=0.5 a 10.6 N push
    # parked the DCM 3.6 cm off reference with z_cmd saturated near the
    # support edge (the falling-tail mechanism); at 300/0.1 the same lane
    # tracks to ~1 mm. Posture/orientation remain regularized, not traded
    # against the balance-critical task.
    w_com: float = 300.0
    w_base_ang: float = 5.0
    w_posture: float = 0.1
    w_force_reg: float = 1e-4
    w_torque_reg: float = 1e-4


class WholeBodyTask(NamedTuple):
    """Per-tick tracking targets (from the DCM-MPC outer loop + posture PD)."""

    com_acc_des: jnp.ndarray        # (3,)
    base_ang_acc_des: jnp.ndarray   # (3,)
    posture_acc_des: jnp.ndarray    # (n,)
    contact_active: jnp.ndarray     # (C,) float/bool mask, static shape
    ext_wrench: jnp.ndarray = None  # (E, 6) estimated external wrenches at
    #   ``ext_frames`` (see build_wholebody_qp) — modeled in the dynamics
    #   equality so the inverse dynamics realizes the commanded
    #   accelerations UNDER the disturbance. Without it a constant push's
    #   moment biases every realized acceleration and the orientation loop
    #   drifts (the r4 closed-loop falling-tail diagnosis).


class WholeBodySolution(NamedTuple):
    nu_dot: jnp.ndarray             # (6+n,)
    wrenches: jnp.ndarray           # (C, 6)
    torques: jnp.ndarray            # (n,)
    qp: QPSolution


def make_variables(tree: KinematicTree, num_contacts: int) -> VariablesHandler:
    handler = VariablesHandler()
    handler.add_variable("nu_dot", tree.nv)
    for c in range(num_contacts):
        handler.add_variable(f"wrench_{c}", 6)
    handler.add_variable("tau", tree.num_dofs)
    return handler


from blf_tpu.ops.precision import f32_matmuls


@f32_matmuls
def build_wholebody_qp(
    tree: KinematicTree,
    params: WholeBodyParams,
    state: rb.FloatingBaseState,
    task: WholeBodyTask,
    ext_frames: Tuple[str, ...] = (),
):
    """Assemble (P, q, A, l, u) for one whole-body tick (single sample;
    vmap for batches).

    ``ext_frames`` (static) names the frames whose ESTIMATED external
    wrenches ``task.ext_wrench`` (rows matching) enter the dynamics
    equality: ``M ν̇ − Σ J_cᵀ f_c − S τ = −h + Σ J_eᵀ ŵ_e`` — the
    estimator stack feeding the controller's *model*, not just its
    reference shift."""
    n = tree.num_dofs
    nv = tree.nv
    C = len(params.contact_frames)
    dtype = state.joint_positions.dtype
    nx = nv + 6 * C + n
    INF = jnp.asarray(jnp.inf, dtype)

    poses = forward_kinematics(
        tree, state.base_position, state.base_rotation, state.joint_positions
    )
    nu = jnp.concatenate([state.base_twist, state.joint_velocities])
    M = rb.mass_matrix(tree, state.base_position, state.base_rotation,
                       state.joint_positions, poses)
    h = rb.bias_forces(tree, state.base_position, state.base_rotation,
                       state.joint_positions, state.base_twist,
                       state.joint_velocities, poses=poses)

    Jc = jnp.stack([
        frame_jacobian(tree, poses, f) for f in params.contact_frames
    ])                                                     # (C, 6, nv)
    jdot_nu = jnp.stack([
        rb.frame_bias_acceleration(
            tree, state.base_position, state.base_rotation,
            state.joint_positions, state.base_twist, state.joint_velocities, f,
        ) for f in params.contact_frames
    ])                                                     # (C, 6)

    active = jnp.asarray(task.contact_active, dtype)       # (C,)

    # -- equality rows -------------------------------------------------------
    # dynamics: [M | −J_0ᵀ … −J_{C−1}ᵀ | −S] x = −h
    S = jnp.concatenate(
        [jnp.zeros((6, n), dtype), jnp.eye(n, dtype=dtype)], axis=0
    )                                                      # (nv, n)
    dyn = jnp.concatenate(
        [M] + [-Jc[c].T for c in range(C)] + [-S], axis=1
    )                                                      # (nv, nx)
    dyn_rhs = -h
    for e, fname in enumerate(ext_frames):
        dyn_rhs = dyn_rhs + frame_jacobian(tree, poses, fname).T @ (
            jnp.asarray(task.ext_wrench, dtype)[e])

    # contact blocks: active → J ν̇ = −J̇ν − k_d J ν on acceleration;
    # inactive → f = 0. Same 6-row shape, blended by the mask.
    eq_blocks, eq_rhs = [], []
    for c in range(C):
        stance_rows = jnp.concatenate(
            [Jc[c],
             jnp.zeros((6, 6 * C), dtype),
             jnp.zeros((6, n), dtype)], axis=1,
        )
        force_rows = jnp.zeros((6, nx), dtype).at[
            :, nv + 6 * c : nv + 6 * (c + 1)
        ].set(jnp.eye(6, dtype=dtype))
        stance_rhs = -jdot_nu[c] - params.stance_damping * (Jc[c] @ nu)
        rows = active[c] * stance_rows + (1 - active[c]) * force_rows
        rhs = active[c] * stance_rhs
        eq_blocks.append(rows)
        eq_rhs.append(rhs)

    A_eq = jnp.concatenate([dyn] + eq_blocks, axis=0)
    b_eq = jnp.concatenate([dyn_rhs] + eq_rhs)

    # -- inequality rows -----------------------------------------------------
    mu, muz = params.friction_mu, params.torsional_mu
    hl, hw = params.foot_half_length, params.foot_half_width
    cone = jnp.asarray(
        [
            [0, 0, -1.0, 0, 0, 0],          # −f_z ≤ 0
            [1, 0, -mu, 0, 0, 0],           # f_x − μ f_z ≤ 0
            [-1, 0, -mu, 0, 0, 0],
            [0, 1, -mu, 0, 0, 0],
            [0, -1, -mu, 0, 0, 0],
            [0, 0, -hl, 0, 1.0, 0],         # τ_y − (L/2) f_z ≤ 0
            [0, 0, -hl, 0, -1.0, 0],
            [0, 0, -hw, 1.0, 0, 0],         # τ_x − (W/2) f_z ≤ 0
            [0, 0, -hw, -1.0, 0, 0],
            [0, 0, -muz, 0, 0, 1.0],        # τ_z − μ_z f_z ≤ 0
            [0, 0, -muz, 0, 0, -1.0],
        ],
        dtype,
    )                                                      # (11, 6)
    ineq_blocks = []
    for c in range(C):
        rows = jnp.zeros((11, nx), dtype).at[
            :, nv + 6 * c : nv + 6 * (c + 1)
        ].set(cone)
        ineq_blocks.append(rows)
    tau_rows = jnp.zeros((n, nx), dtype).at[:, nv + 6 * C :].set(
        jnp.eye(n, dtype=dtype)
    )
    A_in = jnp.concatenate(ineq_blocks + [tau_rows], axis=0)
    u_in = jnp.concatenate(
        [jnp.zeros(11 * C, dtype),
         jnp.full((n,), params.torque_limit, dtype)]
    )
    l_in = jnp.concatenate(
        [jnp.full((11 * C,), -INF, dtype),
         jnp.full((n,), -params.torque_limit, dtype)]
    )

    A = jnp.concatenate([A_eq, A_in], axis=0)
    l = jnp.concatenate([b_eq, l_in])
    u = jnp.concatenate([b_eq, u_in])

    # -- cost ----------------------------------------------------------------
    Jcom = rb.com_jacobian(tree, poses)                    # (3, nv)
    jdot_com = rb.com_bias_acceleration(
        tree, state.base_position, state.base_rotation, state.joint_positions,
        state.base_twist, state.joint_velocities,
    )
    rows_com = jnp.zeros((3, nx), dtype).at[:, :nv].set(Jcom)
    tgt_com = task.com_acc_des - jdot_com

    rows_ang = jnp.zeros((3, nx), dtype).at[:, 3:6].set(jnp.eye(3, dtype=dtype))
    tgt_ang = task.base_ang_acc_des

    rows_post = jnp.zeros((n, nx), dtype).at[:, 6:nv].set(jnp.eye(n, dtype=dtype))
    tgt_post = task.posture_acc_des

    T = jnp.concatenate([rows_com, rows_ang, rows_post], axis=0)
    t = jnp.concatenate([tgt_com, tgt_ang, tgt_post])
    w = jnp.concatenate(
        [jnp.full((3,), params.w_com, dtype),
         jnp.full((3,), params.w_base_ang, dtype),
         jnp.full((n,), params.w_posture, dtype)]
    )
    P = (T.T * w) @ T
    qvec = -(T.T * w) @ t
    # regularisers (strict convexity for the force/torque nullspace)
    reg = jnp.concatenate(
        [jnp.full((nv,), 1e-6, dtype),
         jnp.full((6 * C,), params.w_force_reg, dtype),
         jnp.full((n,), params.w_torque_reg, dtype)]
    )
    P = P + jnp.diag(reg)
    return P, qvec, A, l, u


def solve_wholebody_qp(
    tree: KinematicTree,
    params: WholeBodyParams,
    state: rb.FloatingBaseState,
    task: WholeBodyTask,
    *,
    iterations: int = 150,
    x0: Optional[jnp.ndarray] = None,
    y0: Optional[jnp.ndarray] = None,
    ext_frames: Tuple[str, ...] = (),
    **qp_kwargs,
) -> WholeBodySolution:
    """Build + solve one whole-body tick; vmap-able over scenario batches.

    Note (r4): a dynamics-condensed variant (z = [f|τ], accelerations
    eliminated) was built and measured — it cuts per-iteration HBM traffic
    ~3× but squares the mass-matrix conditioning into the cost (raw cond
    ~5e9; the force-redistribution nullspace sits at the 1e-4 regularizer
    while the CoM rows sit at w_com·‖T M⁻¹B‖²), and the warm-started ADMM
    then stalls two orders above the 1e-4 tolerance. The explicit
    formulation with its well-conditioned KKT remains the production path.
    """
    n, nv, C = tree.num_dofs, tree.nv, len(params.contact_frames)
    P, q, A, l, u = build_wholebody_qp(tree, params, state, task, ext_frames)
    sol = solve_qp(P, q, A, l, u, iterations=iterations, x0=x0, y0=y0,
                   **qp_kwargs)
    return WholeBodySolution(
        nu_dot=sol.x[..., :nv],
        wrenches=sol.x[..., nv : nv + 6 * C].reshape(sol.x.shape[:-1] + (C, 6)),
        torques=sol.x[..., nv + 6 * C :],
        qp=sol,
    )
