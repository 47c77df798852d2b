"""Rigid-body engine tests.

The reference calls iDynTree for CRBA/RNEA/Jacobians
(`FloatingBaseSystemDynamics.cpp:163-244`); SURVEY.md §7 "hard parts" mandates
verifying our from-scratch engine with analytic tiny-chain checks and
finite-difference/autodiff cross-validation (the reference's FD test style).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tol

from blf_tpu.models import rigid_body as rb
from blf_tpu.models.kinematics import (
    JointType,
    KinematicTreeBuilder,
    forward_kinematics,
    frame_jacobian,
    frame_pose,
)
from blf_tpu.ops.integrators import integrate
from blf_tpu.ops.lie import so3_exp, skew

RNG = np.random.default_rng(42)


def single_body(mass=2.5, inertia_diag=(0.1, 0.2, 0.3), com=(0.0, 0.0, 0.0)):
    return KinematicTreeBuilder(
        base_mass=mass, base_com=com, base_inertia=np.diag(inertia_diag)
    ).finalize()


def three_link_chain():
    """Floating base + 3 revolute links with offset CoMs — generic enough to
    exercise every term."""
    b = KinematicTreeBuilder(base_mass=3.0, base_com=(0.01, -0.02, 0.03),
                             base_inertia=np.diag([0.05, 0.06, 0.04]))
    b.add_link("l1", "base", axis=(0, 0, 1), joint_position=(0.1, 0.0, 0.0),
               mass=1.2, com=(0.05, 0.0, 0.02), inertia=np.diag([0.01, 0.012, 0.008]))
    b.add_link("l2", "l1", axis=(0, 1, 0), joint_position=(0.12, 0.0, 0.0),
               mass=0.8, com=(0.06, 0.01, 0.0), inertia=np.diag([0.006, 0.007, 0.005]))
    b.add_link("l3", "l2", axis=(1, 0, 0), joint_position=(0.0, 0.1, 0.0),
               mass=0.5, com=(0.0, 0.04, 0.01), inertia=np.diag([0.003, 0.004, 0.002]))
    b.add_frame("ee", "l3", position=(0.0, 0.08, 0.0))
    return b.finalize()


def random_state(tree, rng=RNG, vel_scale=1.0):
    n = tree.num_dofs
    return rb.FloatingBaseState(
        base_twist=jnp.asarray(rng.uniform(-1, 1, 6) * vel_scale),
        joint_velocities=jnp.asarray(rng.uniform(-1, 1, n) * vel_scale),
        base_position=jnp.asarray(rng.uniform(-0.5, 0.5, 3)),
        base_rotation=so3_exp(jnp.asarray(rng.uniform(-1, 1, 3))),
        joint_positions=jnp.asarray(rng.uniform(-1, 1, n)),
    )


class TestSingleBody:
    """A 6-DoF free body: the engine must reduce to textbook Newton–Euler."""

    def test_mass_matrix_is_spatial_inertia(self):
        tree = single_body()
        M = rb.mass_matrix(tree, jnp.zeros(3), jnp.eye(3), jnp.zeros(0))
        expected = np.zeros((6, 6))
        expected[:3, :3] = 2.5 * np.eye(3)
        expected[3:, 3:] = np.diag([0.1, 0.2, 0.3])
        np.testing.assert_allclose(np.asarray(M), expected, atol=tol(1e-12, 1e-5))

    def test_free_fall(self):
        tree = single_body()
        state = rb.FloatingBaseState(
            jnp.zeros(6), jnp.zeros(0), jnp.zeros(3), jnp.eye(3), jnp.zeros(0)
        )
        inp = rb.FloatingBaseInput(jnp.zeros(0), {})
        d = rb.floating_base_dynamics(tree, state, inp)
        np.testing.assert_allclose(
            np.asarray(d.base_twist), [0, 0, -9.81, 0, 0, 0], atol=tol(1e-12, 1e-5)
        )

    def test_euler_equations_free_rotation(self):
        """Torque-free rotation of an asymmetric top: world angular momentum
        R I ω_body is exactly conserved; Euler dynamics reproduced."""
        tree = single_body(com=(0.0, 0.0, 0.0))
        I_diag = np.array([0.1, 0.2, 0.3])
        omega0 = jnp.array([2.0, 0.1, -1.5])
        state = rb.FloatingBaseState(
            base_twist=jnp.concatenate([jnp.zeros(3), omega0]),
            joint_velocities=jnp.zeros(0),
            base_position=jnp.zeros(3),
            base_rotation=jnp.eye(3),
            joint_positions=jnp.zeros(0),
        )
        f = functools.partial(
            rb.floating_base_dynamics, tree, rho=1.0, gravity=jnp.zeros(3)
        )
        inp = rb.FloatingBaseInput(jnp.zeros(0), {})
        final = integrate(
            lambda s, u, t: f(s, u, t), state, dt=1e-4, num_steps=5000, u=inp
        )
        # world angular momentum conservation
        def ang_mom(s):
            I_w = s.base_rotation @ jnp.diag(jnp.asarray(I_diag)) @ s.base_rotation.T
            return I_w @ s.base_twist[3:]

        np.testing.assert_allclose(
            np.asarray(ang_mom(final)), np.asarray(ang_mom(state)), atol=1e-4
        )
        # and the motion is genuinely tumbling (asymmetric top instability axis)
        assert not np.allclose(np.asarray(final.base_twist[3:]), np.asarray(omega0))

    def test_offset_com_gravity_torque(self):
        """CoM offset from the origin: gravity exerts a torque c × mg about the
        body origin; ν̇ must satisfy the origin-frame Newton-Euler balance."""
        tree = single_body(mass=2.0, com=(0.1, 0.0, 0.0))
        state = rb.FloatingBaseState(
            jnp.zeros(6), jnp.zeros(0), jnp.zeros(3), jnp.eye(3), jnp.zeros(0)
        )
        d = rb.floating_base_dynamics(tree, state, rb.FloatingBaseInput(jnp.zeros(0), {}))
        M = rb.mass_matrix(tree, state.base_position, state.base_rotation,
                           state.joint_positions)
        rhs = np.concatenate([[0, 0, 2.0 * -9.81],
                              np.cross([0.1, 0, 0], [0, 0, 2.0 * -9.81])])
        np.testing.assert_allclose(
            np.asarray(M) @ np.asarray(d.base_twist), rhs, atol=tol(1e-10, 1e-5)
        )


class TestMassMatrix:
    def test_symmetric_positive_definite(self):
        tree = three_link_chain()
        s = random_state(tree)
        M = np.asarray(
            rb.mass_matrix(tree, s.base_position, s.base_rotation, s.joint_positions)
        )
        np.testing.assert_allclose(M, M.T, atol=tol(1e-12, 1e-5))
        assert np.all(np.linalg.eigvalsh(M) > 0)

    def test_kinetic_energy_invariant_to_representation(self):
        """KE must be invariant under a world-frame rigid displacement of the
        whole system (with the twist transported accordingly)."""
        tree = three_link_chain()
        s = random_state(tree)
        nu = jnp.concatenate([s.base_twist, s.joint_velocities])
        ke1 = rb.kinetic_energy(tree, s.base_position, s.base_rotation,
                                s.joint_positions, nu)
        # displace: rotate whole system by Rd, translate by pd
        Rd = so3_exp(jnp.asarray(RNG.uniform(-1, 1, 3)))
        pd = jnp.asarray(RNG.uniform(-1, 1, 3))
        p2 = Rd @ s.base_position + pd
        R2 = Rd @ s.base_rotation
        v2 = Rd @ s.base_twist[:3] + jnp.cross(Rd @ jnp.zeros(3), p2)  # ω_d = 0
        nu2 = jnp.concatenate([v2, Rd @ s.base_twist[3:], s.joint_velocities])
        ke2 = rb.kinetic_energy(tree, p2, R2, s.joint_positions, nu2)
        np.testing.assert_allclose(float(ke1), float(ke2), rtol=tol(1e-10, 1e-5))


class TestJacobians:
    def test_frame_jacobian_vs_jvp(self):
        """J ν must equal the time-derivative of the frame pose along the flow
        (mixed representation) — autodiff ground truth."""
        tree = three_link_chain()
        s = random_state(tree)
        nu = jnp.concatenate([s.base_twist, s.joint_velocities])

        def pose(bp, bR, q):
            poses = forward_kinematics(tree, bp, bR, q)
            R, p = frame_pose(tree, poses, "ee")
            return p, R

        (p, R), (p_dot, R_dot) = jax.jvp(
            pose,
            (s.base_position, s.base_rotation, s.joint_positions),
            (s.base_twist[:3], skew(s.base_twist[3:]) @ s.base_rotation,
             s.joint_velocities),
        )
        poses = forward_kinematics(tree, s.base_position, s.base_rotation,
                                   s.joint_positions)
        v = frame_jacobian(tree, poses, "ee") @ nu
        np.testing.assert_allclose(np.asarray(v[:3]), np.asarray(p_dot), atol=tol(1e-10, 1e-5))
        # angular: Ṙ = ω̂ R  ⇒  ω̂ = Ṙ Rᵀ
        omega_hat = R_dot @ R.T
        np.testing.assert_allclose(
            np.asarray(skew(v[3:])), np.asarray(omega_hat), atol=tol(1e-10, 1e-5)
        )


class TestBiasForces:
    def test_euler_lagrange_cross_check(self):
        """M(q)ν̇ + h(q,ν) must satisfy the Euler–Lagrange equations derived by
        autodiff of the energies — an independent derivation path."""
        tree = three_link_chain()
        s = random_state(tree)
        n = tree.num_dofs
        # Clamp the base (ν_base = 0): joint sub-dynamics are a fixed-base arm.
        qdot = s.joint_velocities
        bp, bR = s.base_position, s.base_rotation

        def Mjj(q):
            M = rb.mass_matrix(tree, bp, bR, q)
            return M[6:, 6:]

        def potential(q):
            poses = forward_kinematics(tree, bp, bR, q)
            com_w = poses.position + jnp.einsum(
                "lij,lj->li", poses.rotation, jnp.asarray(tree.com, dtype=q.dtype)
            )
            return -jnp.sum(jnp.asarray(tree.mass) * (com_w @ rb.GRAVITY))

        q = s.joint_positions
        qddot = jnp.asarray(RNG.uniform(-1, 1, n))

        # Euler–Lagrange: τ = M q̈ + Ṁ q̇ − ½ ∂(q̇ᵀMq̇)/∂q + ∂V/∂q
        _, Mdot = jax.jvp(Mjj, (q,), (qdot,))
        dKE_dq = jax.grad(lambda qq: 0.5 * qdot @ Mjj(qq) @ qdot)(q)
        tau_el = Mjj(q) @ qddot + Mdot @ qdot - dKE_dq + jax.grad(potential)(q)

        # our engine: τ = M q̈ + h (base clamped)
        h = rb.bias_forces(tree, bp, bR, q, jnp.zeros(6), qdot)
        tau_ne = Mjj(q) @ qddot + h[6:]
        np.testing.assert_allclose(np.asarray(tau_ne), np.asarray(tau_el), atol=tol(1e-9, 1e-5))

    def test_gravity_part_matches(self):
        tree = three_link_chain()
        s = random_state(tree)
        G = rb.generalized_gravity(tree, s.base_position, s.base_rotation,
                                   s.joint_positions)
        h0 = rb.bias_forces(tree, s.base_position, s.base_rotation,
                            s.joint_positions, jnp.zeros(6),
                            jnp.zeros(tree.num_dofs))
        np.testing.assert_allclose(np.asarray(G), np.asarray(h0), atol=tol(1e-12, 1e-5))


class TestConservation:
    def test_momentum_and_energy_free_floating(self):
        """Zero gravity, zero torques: spatial momentum and energy conserved
        over an RK4 rollout — the strongest whole-engine invariant."""
        tree = three_link_chain()
        s0 = random_state(tree, vel_scale=0.5)
        f = functools.partial(
            rb.floating_base_dynamics, tree, rho=2.0, gravity=jnp.zeros(3)
        )
        inp = rb.FloatingBaseInput(jnp.zeros(tree.num_dofs), {})
        final = jax.jit(
            lambda s: integrate(lambda st, u, t: f(st, u, t), s, dt=1e-3,
                                num_steps=2000, u=inp, method="rk4")
        )(s0)

        def invariants(s):
            nu = jnp.concatenate([s.base_twist, s.joint_velocities])
            mom = rb.total_momentum(tree, s.base_position, s.base_rotation,
                                    s.joint_positions, nu)
            ke = rb.kinetic_energy(tree, s.base_position, s.base_rotation,
                                   s.joint_positions, nu)
            return np.asarray(mom), float(ke)

        mom0, ke0 = invariants(s0)
        mom1, ke1 = invariants(final)
        np.testing.assert_allclose(mom1, mom0, atol=tol(1e-6, 1e-3))
        np.testing.assert_allclose(ke1, ke0, rtol=tol(1e-6, 1e-3))

    def test_linear_momentum_rate_under_gravity(self):
        tree = three_link_chain()
        s = random_state(tree)
        inp = rb.FloatingBaseInput(jnp.asarray(RNG.uniform(-1, 1, tree.num_dofs)), {})

        def momentum(st):
            nu = jnp.concatenate([st.base_twist, st.joint_velocities])
            return rb.total_momentum(tree, st.base_position, st.base_rotation,
                                     st.joint_positions, nu)[:3]

        d = rb.floating_base_dynamics(tree, s, inp)
        _, mom_dot = jax.jvp(momentum, (s,), (d,))
        np.testing.assert_allclose(
            np.asarray(mom_dot), tree.total_mass * np.array([0, 0, -9.81]), atol=tol(1e-8, 1e-4)
        )


class TestContactInjection:
    def test_external_wrench_momentum_balance(self):
        """An external wrench at the ee frame must change the total momentum at
        exactly the transported rate (internal forces cancel)."""
        tree = three_link_chain()
        s = random_state(tree)
        w = jnp.asarray(RNG.uniform(-5, 5, 6))
        inp = rb.FloatingBaseInput(jnp.zeros(tree.num_dofs), {"ee": w})

        def momentum(st):
            nu = jnp.concatenate([st.base_twist, st.joint_velocities])
            return rb.total_momentum(tree, st.base_position, st.base_rotation,
                                     st.joint_positions, nu)

        d = rb.floating_base_dynamics(tree, s, inp, gravity=jnp.zeros(3))
        _, mom_dot = jax.jvp(momentum, (s,), (d,))
        poses = forward_kinematics(tree, s.base_position, s.base_rotation,
                                   s.joint_positions)
        _, p_ee = frame_pose(tree, poses, "ee")
        expected = np.concatenate(
            [np.asarray(w[:3]), np.asarray(w[3:]) + np.cross(np.asarray(p_ee),
                                                             np.asarray(w[:3]))]
        )
        np.testing.assert_allclose(np.asarray(mom_dot), expected, atol=tol(1e-8, 1e-4))

    def test_mass_matrix_regularization(self):
        tree = three_link_chain()
        s = random_state(tree)
        inp = rb.FloatingBaseInput(jnp.zeros(tree.num_dofs), {})
        reg = 1e-6 * jnp.eye(tree.nv)
        d = rb.floating_base_dynamics(tree, s, inp, mass_matrix_regularization=reg)
        d0 = rb.floating_base_dynamics(tree, s, inp)
        np.testing.assert_allclose(
            np.asarray(d.base_twist), np.asarray(d0.base_twist), atol=1e-4
        )


class TestBatching:
    def test_vmap_over_scenarios(self):
        tree = three_link_chain()
        states = [random_state(tree, np.random.default_rng(k)) for k in range(4)]
        batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
        inp = rb.FloatingBaseInput(jnp.zeros(tree.num_dofs), {})
        batched = jax.vmap(
            lambda st: rb.floating_base_dynamics(tree, st, inp)
        )(batch)
        solo = rb.floating_base_dynamics(tree, states[2], inp)
        np.testing.assert_allclose(
            np.asarray(batched.base_twist[2]), np.asarray(solo.base_twist), atol=tol(1e-12, 1e-5)
        )


class TestContactLoop:
    def test_spring_damper_foot_settles(self):
        """Closed loop with the continuous contact model: a single-body 'foot'
        dropped slightly below its null pose must settle (damped spring)."""
        from blf_tpu.models.contact import ContactParams

        b = KinematicTreeBuilder(base_mass=1.0, base_inertia=np.eye(3) * 0.01)
        b.add_frame("sole", "base", position=(0.0, 0.0, 0.0))
        tree = b.finalize()
        cparams = ContactParams(
            jnp.asarray(0.2), jnp.asarray(0.1),
            jnp.asarray(4e4), jnp.asarray(1e3),
        )
        dyn = rb.make_contact_dynamics(tree, {"sole": cparams}, rho=1.0)
        null = {"sole": (jnp.eye(3), jnp.zeros(3))}
        s0 = rb.FloatingBaseState(
            jnp.zeros(6), jnp.zeros(0),
            jnp.array([0.0, 0.0, -0.005]), jnp.eye(3), jnp.zeros(0),
        )
        final = jax.jit(
            lambda s: integrate(lambda st, u, t: dyn(st, u, t), s, dt=1e-4,
                                num_steps=20000, u=null, method="rk4")
        )(s0)
        # settles near static equilibrium: k_eff * δ = m g
        k_eff = 4e4 * 0.2 * 0.1
        expected_sag = -1.0 * 9.81 / k_eff
        np.testing.assert_allclose(
            float(final.base_position[2]), expected_sag, atol=1e-4
        )
        assert abs(float(final.base_twist[2])) < 1e-3
