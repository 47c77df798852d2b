"""Parallel-in-time RLS tests.

The associative-scan information filter (`blf_tpu/estimators/rls_parallel`)
must be numerically identical to the sequential gain-form filter
(`blf_tpu/estimators/rls`, itself pinned to the reference's
`RecursiveLeastSquare.cpp:96-133`) — trajectory and covariance — including
with forgetting factor λ<1, under batching, and when the stream is sharded
over a mesh axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
from conftest import tol
from jax.sharding import Mesh

from blf_tpu.estimators.rls import RLSParams, RLSState, rls_scan
from blf_tpu.estimators.rls_parallel import (
    rls_fit,
    rls_parallel,
    rls_parallel_sharded,
)


def make_problem(rng, T=256, p=3, m=2, lam=1.0, batch=()):
    theta_true = rng.normal(size=(p,))
    A = rng.normal(size=(T,) + batch + (m, p))
    y = A @ theta_true + 0.1 * rng.normal(size=(T,) + batch + (m,))
    params = RLSParams(jnp.asarray(lam), jnp.asarray(0.01 * np.eye(m)))
    state0 = RLSState(
        jnp.zeros(batch + (p,)),
        jnp.broadcast_to(jnp.asarray(10.0 * np.eye(p)), batch + (p, p)),
    )
    return params, state0, jnp.asarray(A), jnp.asarray(y), theta_true


class TestEquivalence:
    def test_matches_sequential_trajectory(self):
        params, s0, A, y, _ = make_problem(np.random.default_rng(0))
        final_seq, thetas_seq = rls_scan(params, s0, A, y, save_trajectory=True)
        final_par, thetas_par = jax.jit(
            lambda s: rls_parallel(params, s, A, y)
        )(s0)
        np.testing.assert_allclose(thetas_par, thetas_seq, atol=tol(1e-8, 2e-4))
        np.testing.assert_allclose(
            final_par.covariance, final_seq.covariance, atol=tol(1e-8, 2e-4)
        )

    def test_matches_with_forgetting_factor(self):
        params, s0, A, y, _ = make_problem(np.random.default_rng(1), lam=0.97)
        final_seq, thetas_seq = rls_scan(params, s0, A, y, save_trajectory=True)
        final_par, thetas_par = rls_parallel(params, s0, A, y)
        np.testing.assert_allclose(thetas_par, thetas_seq, atol=tol(1e-7, 2e-4))
        np.testing.assert_allclose(
            final_par.covariance, final_seq.covariance, atol=tol(1e-8, 2e-4)
        )

    def test_batched_streams(self):
        params, s0, A, y, _ = make_problem(
            np.random.default_rng(2), T=64, batch=(5,), lam=0.99
        )
        final_seq = rls_scan(params, s0, A, y)
        final_par, _ = rls_parallel(params, s0, A, y)
        np.testing.assert_allclose(final_par.theta, final_seq.theta, atol=tol(1e-8, 2e-4))

    def test_fit_matches_final(self):
        params, s0, A, y, _ = make_problem(np.random.default_rng(3), lam=0.95)
        final_seq = rls_scan(params, s0, A, y)
        fit = jax.jit(lambda s: rls_fit(params, s, A, y))(s0)
        np.testing.assert_allclose(fit.theta, final_seq.theta, atol=tol(1e-8, 2e-4))
        np.testing.assert_allclose(
            fit.covariance, final_seq.covariance, atol=tol(1e-8, 2e-4)
        )

    def test_recovers_ground_truth(self):
        params, s0, A, y, theta_true = make_problem(
            np.random.default_rng(4), T=4096
        )
        final, _ = rls_parallel(params, s0, A, y)
        np.testing.assert_allclose(final.theta, theta_true, atol=5e-3)


class TestSharded:
    def test_sharded_matches_sequential(self):
        devices = jax.devices()
        mesh = Mesh(np.array(devices), ("stream",))
        params, s0, A, y, _ = make_problem(
            np.random.default_rng(5), T=8 * len(devices) * 4, lam=0.98
        )
        final_seq, thetas_seq = rls_scan(params, s0, A, y, save_trajectory=True)
        final_sh, thetas_sh = jax.jit(
            lambda a, b: rls_parallel_sharded(params, s0, a, b, mesh, "stream")
        )(A, y)
        np.testing.assert_allclose(thetas_sh, thetas_seq, atol=tol(1e-7, 2e-4))
        np.testing.assert_allclose(final_sh.theta, final_seq.theta, atol=tol(1e-8, 2e-4))

    def test_rejects_indivisible_stream(self):
        devices = jax.devices()
        mesh = Mesh(np.array(devices), ("stream",))
        params, s0, A, y, _ = make_problem(
            np.random.default_rng(6), T=8 * len(devices) + 1
        )
        try:
            rls_parallel_sharded(params, s0, A, y, mesh, "stream")
            assert False, "expected ValueError"
        except ValueError:
            pass
