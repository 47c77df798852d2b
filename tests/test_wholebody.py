"""Whole-body tracking QP tests — BASELINE config 4 in miniature.

Verification mirrors the reference's style (algebraic balances + closed-loop
behavior) on the 23-DoF humanoid from `blf_tpu.models.robots`.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tol

from blf_tpu.models import rigid_body as rb
from blf_tpu.models.kinematics import forward_kinematics, frame_pose
from blf_tpu.models.robots import HUMANOID_SOLE_FRAMES, make_humanoid_23dof
from blf_tpu.mpc.wholebody import (
    WholeBodyParams,
    WholeBodyTask,
    solve_wholebody_qp,
)
from blf_tpu.ops.integrators import integrate

TREE = make_humanoid_23dof()
PARAMS = WholeBodyParams(contact_frames=HUMANOID_SOLE_FRAMES)
N = TREE.num_dofs


def bent_knee_posture():
    """A slightly bent, statically stable double-support posture."""
    q = np.zeros(N)
    names = TREE.link_names
    dof = TREE.dof_index

    def set_joint(link, value):
        q[dof[names.index(link)]] = value

    for side in ("l", "r"):
        set_joint(f"{side}_upper_leg", 0.25)   # hip pitch
        set_joint(f"{side}_lower_leg", -0.5)   # knee
        set_joint(f"{side}_ankle_1", 0.25)     # ankle pitch
    return jnp.asarray(q)


def standing_state():
    q = bent_knee_posture()
    # place base so the soles are on the ground (z = 0)
    poses = forward_kinematics(TREE, jnp.zeros(3), jnp.eye(3), q)
    _, p_sole = frame_pose(TREE, poses, "l_sole")
    base_pos = jnp.array([0.0, 0.0, -float(p_sole[2])])
    return rb.FloatingBaseState(
        base_twist=jnp.zeros(6),
        joint_velocities=jnp.zeros(N),
        base_position=base_pos,
        base_rotation=jnp.eye(3),
        joint_positions=q,
    )


def standing_task(state, active=(1.0, 1.0)):
    return WholeBodyTask(
        com_acc_des=jnp.zeros(3),
        base_ang_acc_des=jnp.zeros(3),
        posture_acc_des=jnp.zeros(N),
        contact_active=jnp.asarray(active),
    )


class TestStandingBalance:
    def test_solution_satisfies_dynamics(self):
        """The returned (ν̇, f, τ) must satisfy M ν̇ + h = S τ + Σ J_cᵀ f_c."""
        state = standing_state()
        sol = solve_wholebody_qp(TREE, PARAMS, state, standing_task(state),
                                 iterations=400)
        poses = forward_kinematics(TREE, state.base_position,
                                   state.base_rotation, state.joint_positions)
        M = rb.mass_matrix(TREE, state.base_position, state.base_rotation,
                           state.joint_positions, poses)
        h = rb.bias_forces(TREE, state.base_position, state.base_rotation,
                           state.joint_positions, state.base_twist,
                           state.joint_velocities, poses=poses)
        from blf_tpu.models.kinematics import frame_jacobian

        lhs = M @ sol.nu_dot + h
        rhs = jnp.concatenate([jnp.zeros(6), sol.torques])
        for c, f in enumerate(PARAMS.contact_frames):
            rhs = rhs + frame_jacobian(TREE, poses, f).T @ sol.wrenches[c]
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-3)

    def test_weight_distribution(self):
        """Standing still: vertical contact forces carry the robot's weight."""
        state = standing_state()
        sol = solve_wholebody_qp(TREE, PARAMS, state, standing_task(state),
                                 iterations=400)
        total_fz = float(sol.wrenches[:, 2].sum())
        np.testing.assert_allclose(total_fz, TREE.total_mass * 9.81, rtol=0.02)
        # symmetric posture ⇒ near-even split
        np.testing.assert_allclose(
            float(sol.wrenches[0, 2]), float(sol.wrenches[1, 2]),
            rtol=0.1,
        )

    def test_friction_cone_and_cop(self):
        state = standing_state()
        sol = solve_wholebody_qp(TREE, PARAMS, state, standing_task(state),
                                 iterations=400)
        for c in range(2):
            f = np.asarray(sol.wrenches[c])
            assert f[2] > 0
            assert abs(f[0]) <= PARAMS.friction_mu * f[2] + 1e-4
            assert abs(f[1]) <= PARAMS.friction_mu * f[2] + 1e-4
            assert abs(f[4]) <= PARAMS.foot_half_length * f[2] + 1e-4
            assert abs(f[3]) <= PARAMS.foot_half_width * f[2] + 1e-4

    def test_accelerations_near_zero(self):
        """Statically stable stance + zero targets ⇒ tiny accelerations."""
        state = standing_state()
        sol = solve_wholebody_qp(TREE, PARAMS, state, standing_task(state),
                                 iterations=400)
        assert np.abs(np.asarray(sol.nu_dot)).max() < 0.5

    def test_inactive_foot_zero_wrench(self):
        state = standing_state()
        sol = solve_wholebody_qp(
            TREE, PARAMS, state, standing_task(state, active=(1.0, 0.0)),
            iterations=400,
        )
        np.testing.assert_allclose(
            np.asarray(sol.wrenches[1]), np.zeros(6), atol=tol(1e-6, 2e-4)
        )
        # single support still carries the weight
        np.testing.assert_allclose(
            float(sol.wrenches[0, 2]), TREE.total_mass * 9.81, rtol=0.05
        )


class TestTracking:
    def test_com_acceleration_tracking(self):
        """A modest lateral CoM acceleration target is achieved."""
        state = standing_state()
        target = jnp.array([0.4, 0.2, 0.0])
        task = WholeBodyTask(
            com_acc_des=target,
            base_ang_acc_des=jnp.zeros(3),
            posture_acc_des=jnp.zeros(N),
            contact_active=jnp.ones(2),
        )
        # tracking-dominant weighting: the CoM task must win the tradeoff
        # against the (soft) posture regulariser
        params = PARAMS._replace(w_com=1000.0, w_posture=0.05)
        sol = solve_wholebody_qp(TREE, params, state, task, iterations=400)
        poses = forward_kinematics(TREE, state.base_position,
                                   state.base_rotation, state.joint_positions)
        Jcom = rb.com_jacobian(TREE, poses)
        jdot = rb.com_bias_acceleration(
            TREE, state.base_position, state.base_rotation,
            state.joint_positions, state.base_twist, state.joint_velocities,
        )
        com_acc = np.asarray(Jcom @ sol.nu_dot + jdot)
        np.testing.assert_allclose(com_acc, np.asarray(target), atol=0.05)


class TestClosedLoop:
    def test_balance_hold_100hz(self):
        """Config 4 in miniature: WBC at 100 Hz keeps the humanoid upright for
        0.3 s of simulated time (PD on CoM + posture; physics integrated with
        the rigid-body engine between control ticks)."""
        state = standing_state()
        poses = forward_kinematics(TREE, state.base_position,
                                   state.base_rotation, state.joint_positions)
        com_ref = rb.com_position(TREE, poses)
        q_ref = state.joint_positions
        control_dt, physics_dt = 0.01, 0.0025

        def control(state):
            poses = forward_kinematics(TREE, state.base_position,
                                       state.base_rotation,
                                       state.joint_positions)
            com = rb.com_position(TREE, poses)
            com_vel = rb.com_velocity(
                TREE, poses,
                jnp.concatenate([state.base_twist, state.joint_velocities]))
            task = WholeBodyTask(
                com_acc_des=100.0 * (com_ref - com) - 20.0 * com_vel,
                base_ang_acc_des=-20.0 * state.base_twist[3:],
                posture_acc_des=100.0 * (q_ref - state.joint_positions)
                - 20.0 * state.joint_velocities,
                contact_active=jnp.ones(2),
            )
            return solve_wholebody_qp(TREE, PARAMS, state, task,
                                      iterations=200)

        @jax.jit
        def tick(state):
            sol = control(state)
            # apply torques + the QP's own contact wrenches to the plant
            inp = rb.FloatingBaseInput(
                joint_torques=sol.torques,
                contact_wrenches={
                    f: sol.wrenches[c]
                    for c, f in enumerate(PARAMS.contact_frames)
                },
            )
            f = lambda s, u, t: rb.floating_base_dynamics(TREE, s, u, t, rho=1.0)
            new_state = integrate(f, state, dt=physics_dt,
                                  num_steps=int(control_dt / physics_dt), u=inp)
            return new_state, sol

        for _ in range(30):  # 0.3 s at 100 Hz
            state, sol = tick(state)

        poses = forward_kinematics(TREE, state.base_position,
                                   state.base_rotation, state.joint_positions)
        com = rb.com_position(TREE, poses)
        assert np.abs(np.asarray(com - com_ref)).max() < 0.02
        assert np.abs(np.asarray(state.base_twist)).max() < 0.5
        # base stays upright
        assert float(state.base_rotation[2, 2]) > 0.99


class TestBatched:
    def test_vmap_over_perturbed_states(self):
        state = standing_state()
        rng = np.random.default_rng(0)
        dq = jnp.asarray(rng.uniform(-0.02, 0.02, (8, N)))
        batch = jax.vmap(
            lambda d: state._replace(joint_positions=state.joint_positions + d)
        )(dq)
        task = standing_task(state)
        sols = jax.jit(jax.vmap(
            lambda s: solve_wholebody_qp(TREE, PARAMS, s, task, iterations=200)
        ))(batch)
        assert sols.torques.shape == (8, N)
        assert np.all(np.isfinite(np.asarray(sols.torques)))
        solo = solve_wholebody_qp(TREE, PARAMS,
                                  jax.tree_util.tree_map(lambda x: x[3], batch),
                                  task, iterations=200)
        np.testing.assert_allclose(
            np.asarray(sols.nu_dot[3]), np.asarray(solo.nu_dot),
            atol=tol(1e-8, 1e-4)
        )

