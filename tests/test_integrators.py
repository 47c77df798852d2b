"""Integrator tests.

Port of the reference's `src/System/tests/IntegratorTest.cpp` closed-form
checks (dT = 1e-4, 2 s horizon, tolerance 1e-3 — BASELINE.md rows 2-3),
batched per SURVEY.md §4's "single-chip vs vmap-batch equivalence" mandate.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from conftest import tol
from scipy.spatial.transform import Rotation as ScipyRot

from blf_tpu.ops.integrators import integrate, rk4_step, forward_euler_step
from blf_tpu.models.systems import (
    FloatingBaseKinInput,
    FloatingBaseKinState,
    LTIParams,
    floating_base_kinematics,
    lti_dynamics,
)

DT = 1e-4
SIM_TIME = 2.0
NUM_STEPS = int(SIM_TIME / DT)
TOL = 1e-3  # IntegratorTest.cpp:23-25


class TestLinearSystem:
    """IntegratorTest.cpp:33-79 "Linear System": step response of
    ẋ = [[0,1],[-2,-2]]x + [0,2]u, u = 1, x0 = 0."""

    params = LTIParams(
        A=jnp.array([[0.0, 1.0], [-2.0, -2.0]]), B=jnp.array([[0.0], [2.0]])
    ).validate()

    @staticmethod
    def closed_form(t):
        # IntegratorTest.cpp:55-60
        return np.stack(
            [
                1 - np.exp(-t) * (np.cos(t) + np.sin(t)),
                2 * np.exp(-t) * np.sin(t),
            ],
            axis=-1,
        )

    def test_step_response_matches_closed_form(self):
        f = functools.partial(lti_dynamics, self.params)
        _, traj = jax.jit(
            lambda x0: integrate(
                f, x0, dt=DT, num_steps=NUM_STEPS, u=jnp.array([1.0]),
                save_trajectory=True,
            )
        )(jnp.zeros(2))
        t = np.arange(NUM_STEPS + 1) * DT
        np.testing.assert_allclose(np.asarray(traj), self.closed_form(t), atol=TOL)

    def test_rk4_beats_euler(self):
        f = functools.partial(lti_dynamics, self.params)
        t = np.arange(NUM_STEPS + 1) * DT
        errs = {}
        for method in ("euler", "rk4"):
            _, traj = integrate(
                f, jnp.zeros(2), dt=DT, num_steps=NUM_STEPS, u=jnp.array([1.0]),
                method=method, save_trajectory=True,
            )
            errs[method] = np.max(np.abs(np.asarray(traj) - self.closed_form(t)))
        assert errs["rk4"] < errs["euler"] * tol(1e-3, 0.05)

    def test_vmap_batch_equivalence(self):
        """A batch of scenarios must reproduce the per-lane solve bit-for-bit."""
        f = functools.partial(lti_dynamics, self.params)
        x0s = jnp.asarray(np.random.default_rng(0).normal(size=(8, 2)))
        solo = jnp.stack(
            [integrate(f, x0, dt=1e-2, num_steps=50, u=jnp.array([1.0])) for x0 in x0s]
        )
        batched = jax.vmap(
            lambda x0: integrate(f, x0, dt=1e-2, num_steps=50, u=jnp.array([1.0]))
        )(x0s)
        np.testing.assert_array_equal(np.asarray(batched), np.asarray(solo))

    def test_time_varying_input(self):
        # ẋ = u with u_k = k·dt ⇒ x(T) = T²/2.
        f = lambda x, u, t: u
        us = (jnp.arange(1000) * 1e-3)[:, None]
        x = integrate(f, jnp.zeros(1), dt=1e-3, num_steps=1000, us=us)
        np.testing.assert_allclose(x, 0.5 * 1.0**2, atol=1e-3)

    def test_shape_validation(self):
        import pytest

        with pytest.raises(ValueError):
            LTIParams(A=jnp.zeros((2, 3)), B=jnp.zeros((2, 1))).validate()
        with pytest.raises(ValueError):
            LTIParams(A=jnp.zeros((2, 2)), B=jnp.zeros((3, 1))).validate()
        with pytest.raises(ValueError):
            integrate(lambda x, u, t: x, jnp.zeros(1), dt=0.1, num_steps=1, method="nope")


class TestFloatingBaseKinematics:
    """IntegratorTest.cpp:81-127 "Floating base System Kinematics": constant
    twist ⇒ p(t) = p0 + t·v, R(t) = exp(t·ω̂)·R0, s(t) = s0 + t·ṡ (20 DoF)."""

    def test_matches_exponential_map(self):
        rng = np.random.default_rng(7)
        twist = jnp.asarray(rng.uniform(-1, 1, size=6))
        joint_vel = jnp.asarray(rng.uniform(-1, 1, size=20))
        state0 = FloatingBaseKinState(
            position=jnp.zeros(3),
            rotation=jnp.eye(3),
            joint_positions=jnp.zeros(20),
        )
        inp = FloatingBaseKinInput(base_twist=twist, joint_velocities=joint_vel)

        f = functools.partial(floating_base_kinematics, rho=0.0)
        _, traj = jax.jit(
            lambda s: integrate(
                f, s, dt=DT, num_steps=NUM_STEPS, u=inp, save_trajectory=True
            )
        )(state0)

        t = np.arange(NUM_STEPS + 1) * DT
        # closed forms (IntegratorTest.cpp:97-104)
        pos_exact = t[:, None] * np.asarray(twist[:3])
        joint_exact = t[:, None] * np.asarray(joint_vel)
        omega = np.asarray(twist[3:])
        rot_exact = ScipyRot.from_rotvec(t[:, None] * omega).as_matrix()

        np.testing.assert_allclose(np.asarray(traj.position), pos_exact, atol=TOL)
        np.testing.assert_allclose(np.asarray(traj.joint_positions), joint_exact, atol=TOL)
        np.testing.assert_allclose(np.asarray(traj.rotation), rot_exact, atol=TOL)

    def test_baumgarte_keeps_rotation_orthonormal(self):
        """With ρ > 0 a long Euler rollout must stay on SO(3) (the very reason
        for the reference's stabiliser, FloatingBaseSystemKinematics.cpp:64-68)."""
        rng = np.random.default_rng(3)
        twist = jnp.asarray(rng.uniform(-1, 1, size=6))
        state0 = FloatingBaseKinState(
            position=jnp.zeros(3), rotation=jnp.eye(3), joint_positions=jnp.zeros(2)
        )
        inp = FloatingBaseKinInput(base_twist=twist, joint_velocities=jnp.zeros(2))

        final_no = integrate(
            functools.partial(floating_base_kinematics, rho=0.0),
            state0, dt=1e-2, num_steps=2000, u=inp,
        )
        final_bg = integrate(
            functools.partial(floating_base_kinematics, rho=5.0),
            state0, dt=1e-2, num_steps=2000, u=inp,
        )
        drift_no = np.abs(final_no.rotation @ final_no.rotation.T - np.eye(3)).max()
        drift_bg = np.abs(final_bg.rotation @ final_bg.rotation.T - np.eye(3)).max()
        assert drift_bg < drift_no / 10
        assert drift_bg < 1e-2
