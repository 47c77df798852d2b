"""Continuous contact model tests.

Port of `src/ContactModels/tests/ContinousContactModelTest.cpp`: Monte-Carlo
wrench check (tol 1e-2), regressor identity (tol 1e-7), finite-difference
wrench rate (tol 1e-4) — BASELINE.md rows 4-6 — plus vmap batch equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import tol

from blf_tpu.models import contact
from blf_tpu.ops.lie import rpy_to_rot, so3_exp
from blf_tpu.utils.params import ParametersHandler

# fixture mirrors ContinousContactModelTest.cpp:34-58
SPRING = 2000.0
DAMPER = 100.0
LENGTH = 0.12
WIDTH = 0.09

RNG = np.random.default_rng(42)


def make_fixture():
    params = contact.ContactParams(
        length=jnp.asarray(LENGTH),
        width=jnp.asarray(WIDTH),
        spring_coeff=jnp.asarray(SPRING),
        damper_coeff=jnp.asarray(DAMPER),
    )
    state = contact.ContactState(
        position=jnp.array([-0.02, 0.01, 0.005]),
        rotation=rpy_to_rot(-0.15, 0.2, 0.1),
        linear_velocity=jnp.asarray(RNG.uniform(-1, 1, 3)),
        angular_velocity=jnp.asarray(RNG.uniform(-1, 1, 3)),
        null_position=jnp.zeros(3),
        null_rotation=jnp.eye(3),
    )
    return params, state


class TestInitializeProtocol:
    def test_params_from_handler(self):
        h = ParametersHandler(
            {"length": LENGTH, "width": WIDTH, "spring_coeff": SPRING,
             "damper_coeff": DAMPER}
        )
        p = contact.params_from_handler(h)
        assert float(p.spring_coeff) == pytest.approx(SPRING, rel=1e-6)
        assert float(p.width) == pytest.approx(WIDTH, rel=1e-6)

    def test_missing_param_raises(self):
        import pytest

        with pytest.raises(KeyError):
            contact.params_from_handler(ParametersHandler({"length": LENGTH}))


class TestContactWrench:
    def test_monte_carlo_integral(self):
        """ContinousContactModelTest.cpp:60-104: closed-form wrench equals the
        Monte-Carlo surface integral of the pointwise law (1e4 samples)."""
        params, state = make_fixture()
        n = 10_000
        xs = jnp.asarray(RNG.uniform(-LENGTH / 2, LENGTH / 2, n))
        ys = jnp.asarray(RNG.uniform(-WIDTH / 2, WIDTH / 2, n))

        forces = jax.vmap(lambda x, y: contact.force_at_point(params, state, x, y))(xs, ys)
        torques = jax.vmap(lambda x, y: contact.torque_at_point(params, state, x, y))(xs, ys)

        area = LENGTH * WIDTH
        r33 = np.abs(np.asarray(state.rotation)[2, 2])
        numerical = np.concatenate(
            [np.mean(forces, axis=0), np.mean(torques, axis=0)]
        ) * area * r33

        analytic = np.asarray(contact.contact_wrench(params, state))
        np.testing.assert_allclose(numerical, analytic, atol=1e-2)

    def test_point_force_zero_outside_patch(self):
        params, state = make_fixture()
        f = contact.force_at_point(params, state, LENGTH, 0.0)
        np.testing.assert_array_equal(np.asarray(f), np.zeros(3))
        t = contact.torque_at_point(params, state, 0.0, WIDTH)
        np.testing.assert_array_equal(np.asarray(t), np.zeros(3))


class TestRegressor:
    def test_identity_wrench_equals_A_theta(self):
        """ContinousContactModelTest.cpp:107-124: w == A·[k; b] to 1e-7."""
        params, state = make_fixture()
        A = contact.regressor(params, state)
        theta = jnp.array([SPRING, DAMPER])
        np.testing.assert_allclose(
            np.asarray(A @ theta), np.asarray(contact.contact_wrench(params, state)),
            atol=1e-7,
        )


class TestContactDynamics:
    def test_wrench_rate_vs_finite_differences(self):
        """ContinousContactModelTest.cpp:126-213: ẇ = f + G·a vs central
        differences with mixed-representation pose propagation (step 1e-6)."""
        params, state = make_fixture()
        acc = jnp.ones(6)
        h = tol(1e-6, 1e-3)

        analytic = contact.wrench_rate(params, state, acc)

        def propagate(sign):
            # mixed representation, constant twist over the step:
            # p(t±h) = p ± v·h ; R(t±h) = exp(±ω̂ h)·R ; v(t±h) = v ± a·h
            dp = sign * h * state.linear_velocity
            dR = so3_exp(sign * h * state.angular_velocity)
            return contact.ContactState(
                position=state.position + dp,
                rotation=dR @ state.rotation,
                linear_velocity=state.linear_velocity + sign * h * acc[:3],
                angular_velocity=state.angular_velocity + sign * h * acc[3:],
                null_position=state.null_position,
                null_rotation=state.null_rotation,
            )

        w_next = contact.contact_wrench(params, propagate(+1.0))
        w_prev = contact.contact_wrench(params, propagate(-1.0))
        numerical = (w_next - w_prev) / (2 * h)
        np.testing.assert_allclose(np.asarray(numerical), np.asarray(analytic),
                                   atol=tol(1e-4, 0.5), rtol=tol(0, 2e-2))

    def test_control_matrix_structure(self):
        params, state = make_fixture()
        G = np.asarray(contact.control_matrix(params, state))
        # off-diagonal blocks are exactly zero (ContinuousContactModel.cpp:148-171)
        np.testing.assert_array_equal(G[:3, 3:], np.zeros((3, 3)))
        np.testing.assert_array_equal(G[3:, :3], np.zeros((3, 3)))
        r33 = np.asarray(state.rotation)[2, 2]
        np.testing.assert_allclose(
            G[:3, :3], -LENGTH * WIDTH * DAMPER * r33 * np.eye(3), atol=1e-12
        )


class TestBatching:
    def test_vmap_matches_per_lane(self):
        params, state = make_fixture()
        batch = jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (4,) + leaf.shape), state
        )
        batched = jax.vmap(lambda s: contact.contact_wrench(params, s))(batch)
        single = contact.contact_wrench(params, state)
        for lane in np.asarray(batched):
            np.testing.assert_array_equal(lane, np.asarray(single))

    def test_broadcasting_without_vmap(self):
        """Leading batch axes flow through without vmap (pure broadcasting)."""
        params, state = make_fixture()
        batch = jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (4,) + leaf.shape), state
        )
        out = contact.contact_wrench(params, batch)
        assert out.shape == (4, 6)
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(contact.contact_wrench(params, state)),
            atol=1e-12,
        )
