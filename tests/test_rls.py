"""Recursive-least-squares tests.

Port of `src/Estimators/tests/RecursiveLeastSquareTest.cpp`: the 2-parameter
nonlinear-regressor model with Gaussian noise must be identified to ≤0.1%
relative error after 10k steps (BASELINE.md row 7), config loaded from the
reference's exact `config.ini` fixture — plus batched-fleet convergence and
an integration test with the contact-model regressor (SURVEY.md §3.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
from conftest import tol

from blf_tpu.estimators.rls import init_from_handler, rls_scan, rls_step
from blf_tpu.utils.params import IniHandler

# src/Estimators/tests/config.ini, verbatim
CONFIG_INI = """\
lambda                  1.0
measurement_covariance (0.5, 0.5)
state                  (0.0, 0.0)
state_covariance       (10.0, 10.0)
"""

TRUE_PARAMS = np.array([43.2, 12.2])  # RecursiveLeastSquareTest.cpp:95-97


def make_stream(rng, num_steps=10_000):
    """The test model (RecursiveLeastSquareTest.cpp:41-89):
    y = [x, x²; sin x, cos x]·θ + N(0, 0.5²), x_i = cos(i/10)."""
    i = np.arange(num_steps)
    x = np.cos(i / 10.0)
    regressors = np.stack(
        [np.stack([x, x * x], -1), np.stack([np.sin(x), np.cos(x)], -1)], axis=1
    )  # (T, 2, 2)
    noise = rng.normal(0.0, 0.5, size=(num_steps, 2))
    measurements = regressors @ TRUE_PARAMS + noise
    return jnp.asarray(regressors), jnp.asarray(measurements)


class TestConvergence:
    def test_recovers_parameters_from_ini_config(self):
        params, state0 = init_from_handler(IniHandler.from_string(CONFIG_INI))
        regressors, measurements = make_stream(np.random.default_rng(42))
        final = jax.jit(lambda s: rls_scan(params, s, regressors, measurements))(state0)
        rel_err = np.abs(np.asarray(final.theta) - TRUE_PARAMS) / TRUE_PARAMS
        assert np.all(rel_err < 1e-3)  # 0.1%, RecursiveLeastSquareTest.cpp:125-141

    def test_covariance_contracts(self):
        params, state0 = init_from_handler(IniHandler.from_string(CONFIG_INI))
        regressors, measurements = make_stream(np.random.default_rng(1), 1000)
        final = rls_scan(params, state0, regressors, measurements)
        assert np.trace(np.asarray(final.covariance)) < np.trace(
            np.asarray(state0.covariance)
        )

    def test_forgetting_factor_tracks_drifting_parameters(self):
        """λ < 1 tracks a slowly drifting θ that λ = 1 cannot follow (the
        purpose of the reference's `lambda` parameter). Uses a persistently
        exciting random regressor to avoid classic RLS covariance wind-up."""
        rng = np.random.default_rng(2)
        T = 3000
        regressors = jnp.asarray(rng.normal(size=(T, 2, 2)))
        theta_t = TRUE_PARAMS[None, :] * (1.0 + 0.3 * np.sin(np.arange(T) / 200.0))[:, None]
        measurements = jnp.asarray(
            np.einsum("tmp,tp->tm", np.asarray(regressors), theta_t)
            + rng.normal(0, 0.1, (T, 2))
        )
        errs = {}
        for lam in ("1.0", "0.95"):
            h = IniHandler.from_string(CONFIG_INI.replace("1.0", lam, 1))
            params, state0 = init_from_handler(h)
            _, thetas = rls_scan(
                params, state0, regressors, measurements, save_trajectory=True
            )
            # tracking error over the second half, after burn-in
            errs[lam] = np.mean(
                np.abs(np.asarray(thetas)[T // 2:] - theta_t[T // 2:])
            )
        assert errs["0.95"] < errs["1.0"] / 5


class TestBatching:
    def test_fleet_of_estimators(self):
        """A vmapped fleet with independent noise must all converge — the
        batched-filter design SURVEY.md §2.3 requires."""
        params, state0 = init_from_handler(IniHandler.from_string(CONFIG_INI))
        batch = 16
        rngs = [np.random.default_rng(100 + k) for k in range(batch)]
        streams = [make_stream(r, 4000) for r in rngs]
        regressors = jnp.stack([s[0] for s in streams], axis=1)   # (T, B, 2, 2)
        measurements = jnp.stack([s[1] for s in streams], axis=1)  # (T, B, 2)
        state0_b = jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (batch,) + leaf.shape), state0
        )
        final = jax.jit(
            lambda s: rls_scan(params, s, regressors, measurements)
        )(state0_b)
        rel_err = np.abs(np.asarray(final.theta) - TRUE_PARAMS) / TRUE_PARAMS
        assert rel_err.shape == (batch, 2)
        assert np.all(rel_err < 5e-3)

    def test_single_step_matches_manual_update(self):
        params, state0 = init_from_handler(IniHandler.from_string(CONFIG_INI))
        A = jnp.array([[1.0, 2.0], [0.5, -1.0]])
        y = jnp.array([3.0, 1.0])
        out = rls_step(params, state0, A, y)
        # manual dense-inverse update (RecursiveLeastSquare.cpp:120-130)
        P = np.diag([10.0, 10.0])
        R = np.diag([0.5, 0.5])
        S = 1.0 * R + np.asarray(A) @ P @ np.asarray(A).T
        K = P @ np.asarray(A).T @ np.linalg.inv(S)
        theta = K @ np.asarray(y)
        P_next = P - K @ np.asarray(A) @ P
        np.testing.assert_allclose(np.asarray(out.theta), theta,
                                   atol=tol(1e-12, 1e-5))
        np.testing.assert_allclose(np.asarray(out.covariance), P_next,
                                   atol=tol(1e-12, 1e-5))


class TestContactIdentification:
    def test_identifies_spring_damper_from_wrench(self):
        """RLS wired to the contact-model regressor identifies (k, b) from
        noisy wrench measurements — the reference's intended pairing
        (SURVEY.md §2 row 5 'Above')."""
        from blf_tpu.models import contact
        from blf_tpu.ops.lie import so3_exp
        from blf_tpu.utils.params import ParametersHandler

        true_k, true_b = 2000.0, 100.0
        cparams = contact.ContactParams(
            jnp.asarray(0.12), jnp.asarray(0.09), jnp.asarray(true_k), jnp.asarray(true_b)
        )
        rng = np.random.default_rng(0)
        T = 2000
        # a wandering frame: random small poses and twists per tick
        states = contact.ContactState(
            position=jnp.asarray(rng.uniform(-0.02, 0.02, (T, 3))),
            rotation=so3_exp(jnp.asarray(rng.uniform(-0.2, 0.2, (T, 3)))),
            linear_velocity=jnp.asarray(rng.uniform(-1, 1, (T, 3))),
            angular_velocity=jnp.asarray(rng.uniform(-1, 1, (T, 3))),
            null_position=jnp.zeros((T, 3)),
            null_rotation=jnp.broadcast_to(jnp.eye(3), (T, 3, 3)),
        )
        regressors = contact.regressor(cparams, states)           # (T, 6, 2)
        wrenches = contact.contact_wrench(cparams, states)
        wrenches = wrenches + jnp.asarray(rng.normal(0, 0.05, (T, 6)))

        h = ParametersHandler(
            {"lambda": 1.0, "measurement_covariance": [0.05**2] * 6,
             "state": [0.0, 0.0], "state_covariance": [1e6, 1e6]}
        )
        params, state0 = init_from_handler(h)
        final = rls_scan(params, state0, regressors, wrenches)
        np.testing.assert_allclose(
            np.asarray(final.theta), [true_k, true_b], rtol=1e-2
        )
