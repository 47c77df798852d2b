"""LQR tests: sequential vs parallel-in-time equivalence + optimality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tol

from blf_tpu.mpc.riccati import solve_lqr, solve_lqr_sharded

RNG = np.random.default_rng(0)


def random_lqr(T=24, nx=4, nu=2, rng=RNG):
    Fs = jnp.asarray(
        np.stack([np.eye(nx) + 0.05 * rng.normal(size=(nx, nx))
                  for _ in range(T)])
    )
    cs = jnp.asarray(rng.normal(size=(T, nx)) * 0.1)
    Ls = jnp.asarray(rng.normal(size=(T, nx, nu)) * 0.3)
    Qs = jnp.asarray(
        np.stack([np.eye(nx) * rng.uniform(0.5, 2.0) for _ in range(T)])
    )
    Rs = jnp.asarray(
        np.stack([np.eye(nu) * rng.uniform(0.1, 1.0) for _ in range(T)])
    )
    QT = jnp.asarray(np.eye(nx) * 5.0)
    x0 = jnp.asarray(rng.normal(size=nx))
    return Fs, cs, Ls, Qs, Rs, QT, x0


def lqr_cost(Qs, Rs, QT, xs, us):
    run = sum(
        0.5 * xs[k] @ Qs[k] @ xs[k] + 0.5 * us[k] @ Rs[k] @ us[k]
        for k in range(len(us))
    )
    return float(run + 0.5 * xs[-1] @ QT @ xs[-1])


class TestSequential:
    def test_optimality_vs_perturbations(self):
        """The returned controls must beat random perturbations (local optimum
        check of the full trajectory cost)."""
        prob = random_lqr()
        sol = solve_lqr(*prob)
        base = lqr_cost(prob[3], prob[4], prob[5], sol.states, sol.controls)
        Fs, cs, Ls = prob[0], prob[1], prob[2]
        rng = np.random.default_rng(1)
        for _ in range(5):
            du = jnp.asarray(rng.normal(size=sol.controls.shape) * 1e-2)
            us = sol.controls + du
            x = prob[6]
            xs = [x]
            for k in range(len(us)):
                x = Fs[k] @ x + Ls[k] @ us[k] + cs[k]
                xs.append(x)
            pert = lqr_cost(prob[3], prob[4], prob[5], jnp.stack(xs), us)
            assert pert >= base - 1e-9

    def test_matches_condensed_least_squares(self):
        """Against an independent dense solve of the same quadratic program."""
        T, nx, nu = 8, 3, 2
        prob = random_lqr(T, nx, nu, np.random.default_rng(2))
        Fs, cs, Ls, Qs, Rs, QT, x0 = map(np.asarray, prob)
        sol = solve_lqr(*prob)

        # dense QP in u = vec(u_0..u_{T-1}); x = Phi x0 + G u + d
        nU = T * nu
        G = np.zeros(((T + 1) * nx, nU))
        d = np.zeros((T + 1) * nx)
        Phi = np.zeros(((T + 1) * nx, nx))
        Phi[:nx] = np.eye(nx)
        xblk = np.eye(nx)
        for k in range(T):
            Phi[(k + 1) * nx:(k + 2) * nx] = Fs[k] @ Phi[k * nx:(k + 1) * nx]
            d[(k + 1) * nx:(k + 2) * nx] = Fs[k] @ d[k * nx:(k + 1) * nx] + cs[k]
            for j in range(k + 1):
                blk = np.eye(nx)
                for i in range(k, j, -1):
                    blk = blk @ Fs[i]
                G[(k + 1) * nx:(k + 2) * nx, j * nu:(j + 1) * nu] = blk @ Ls[j]
        Qbig = np.zeros(((T + 1) * nx, (T + 1) * nx))
        for k in range(T):
            Qbig[k * nx:(k + 1) * nx, k * nx:(k + 1) * nx] = Qs[k]
        Qbig[T * nx:, T * nx:] = QT
        Rbig = np.kron(np.eye(T), np.zeros((nu, nu)))
        for k in range(T):
            Rbig[k * nu:(k + 1) * nu, k * nu:(k + 1) * nu] = Rs[k]
        xb = Phi @ x0 + d
        H = G.T @ Qbig @ G + Rbig
        g = G.T @ Qbig @ xb
        u_ref = np.linalg.solve(H, -g)
        np.testing.assert_allclose(
            np.asarray(sol.controls).ravel(), u_ref, atol=tol(1e-8, 3e-4)
        )


class TestParallel:
    @pytest.mark.parametrize("T", [4, 17, 64])
    def test_matches_sequential(self, T):
        prob = random_lqr(T, 4, 2, np.random.default_rng(T))
        seq = solve_lqr(*prob, parallel=False)
        par = solve_lqr(*prob, parallel=True)
        np.testing.assert_allclose(
            np.asarray(par.value_matrices), np.asarray(seq.value_matrices),
            atol=tol(1e-8, 3e-4),
        )
        np.testing.assert_allclose(
            np.asarray(par.value_vectors), np.asarray(seq.value_vectors),
            atol=tol(1e-8, 3e-4),
        )
        np.testing.assert_allclose(
            np.asarray(par.gains), np.asarray(seq.gains), atol=tol(1e-8, 3e-4)
        )
        np.testing.assert_allclose(
            np.asarray(par.controls), np.asarray(seq.controls), atol=tol(1e-8, 3e-4)
        )

    def test_jit_and_vmap(self):
        prob = random_lqr(16, 4, 2, np.random.default_rng(9))
        x0s = jnp.asarray(np.random.default_rng(3).normal(size=(8, 4)))
        sols = jax.jit(jax.vmap(
            lambda x0: solve_lqr(*prob[:-1], x0, parallel=True)
        ))(x0s)
        assert sols.controls.shape == (8, 16, 2)
        solo = solve_lqr(*prob[:-1], x0s[5], parallel=True)
        np.testing.assert_allclose(
            np.asarray(sols.controls[5]), np.asarray(solo.controls), atol=tol(1e-10, 3e-4)
        )


class TestSharded:
    """Horizon-sharded LQR over a virtual device mesh (the SP component)."""

    def _mesh(self, n):
        import numpy as np_
        from jax.sharding import Mesh

        return Mesh(np_.array(jax.devices()[:n]), ("seq",))

    @pytest.mark.parametrize("n_shards", [2, 4, 8])
    def test_matches_sequential(self, n_shards):
        prob = random_lqr(T=32, nx=4, nu=2,
                          rng=np.random.default_rng(3 + n_shards))
        ref = solve_lqr(*prob)
        mesh = self._mesh(n_shards)
        sol = solve_lqr_sharded(*prob, mesh, "seq")
        np.testing.assert_allclose(sol.gains, ref.gains, atol=tol(1e-8, 3e-4))
        np.testing.assert_allclose(sol.feedforward, ref.feedforward,
                                   atol=tol(1e-8, 3e-4))
        np.testing.assert_allclose(sol.value_matrices, ref.value_matrices,
                                   rtol=tol(1e-8, 3e-4), atol=tol(1e-8, 3e-4))
        np.testing.assert_allclose(sol.states, ref.states, atol=tol(1e-8, 3e-4))
        np.testing.assert_allclose(sol.controls, ref.controls, atol=tol(1e-8, 3e-4))

    def test_jit_and_horizon_not_divisible(self):
        mesh = self._mesh(4)
        prob = random_lqr(T=16, nx=3, nu=2, rng=np.random.default_rng(9))
        jitted = jax.jit(
            lambda *a: solve_lqr_sharded(*a, mesh, "seq").controls
        )
        ref = solve_lqr(*prob)
        np.testing.assert_allclose(jitted(*prob), ref.controls, atol=tol(1e-8, 3e-4))
        bad = random_lqr(T=18, nx=3, nu=2, rng=np.random.default_rng(10))
        with pytest.raises(ValueError, match="not divisible"):
            solve_lqr_sharded(*bad, mesh, "seq")


class TestGeneralParallelValue:
    """parallel_value_general: the SQP-shaped subproblem (cross terms +
    linear costs) in O(log T) depth must match the sequential backward."""

    def _problem(self, T=24, nx=5, nu=3, seed=0):
        rng = np.random.default_rng(seed)
        A = jnp.asarray(np.stack([np.eye(nx) + 0.08 * rng.normal(size=(nx, nx))
                                  for _ in range(T)]))
        B = jnp.asarray(rng.normal(size=(T, nx, nu)) * 0.4)
        lx = jnp.asarray(rng.normal(size=(T, nx)) * 0.3)
        lu = jnp.asarray(rng.normal(size=(T, nu)) * 0.3)
        Ms = rng.normal(size=(T, nx, nx))
        lxx = jnp.asarray(Ms @ np.swapaxes(Ms, -1, -2) * 0.1
                          + np.eye(nx) * 0.5)
        Mu = rng.normal(size=(T, nu, nu))
        luu = jnp.asarray(Mu @ np.swapaxes(Mu, -1, -2) * 0.1 + np.eye(nu))
        lux = jnp.asarray(rng.normal(size=(T, nu, nx)) * 0.2)
        VxT = jnp.asarray(rng.normal(size=nx))
        MT = rng.normal(size=(nx, nx))
        VxxT = jnp.asarray(MT @ MT.T * 0.1 + np.eye(nx) * 2.0)
        return A, B, lx, lu, lxx, luu, lux, VxT, VxxT

    def _sequential(self, A, B, lx, lu, lxx, luu, lux, VxT, VxxT):
        T = A.shape[0]
        Vx, Vxx = np.asarray(VxT), np.asarray(VxxT)
        Vxs, Vxxs = [Vx], [Vxx]
        for k in reversed(range(T)):
            Ak, Bk = np.asarray(A[k]), np.asarray(B[k])
            Qx = np.asarray(lx[k]) + Ak.T @ Vx
            Qu = np.asarray(lu[k]) + Bk.T @ Vx
            Qxx = np.asarray(lxx[k]) + Ak.T @ Vxx @ Ak
            Quu = np.asarray(luu[k]) + Bk.T @ Vxx @ Bk
            Qux = np.asarray(lux[k]) + Bk.T @ Vxx @ Ak
            K = np.linalg.solve(Quu, Qux)
            kff = np.linalg.solve(Quu, Qu)
            Vx = Qx + K.T @ Quu @ kff - K.T @ Qu - Qux.T @ kff
            Vxx = Qxx + K.T @ Quu @ K - K.T @ Qux - Qux.T @ K
            Vxx = 0.5 * (Vxx + Vxx.T)
            Vxs.append(Vx); Vxxs.append(Vxx)
        return np.stack(Vxs[::-1]), np.stack(Vxxs[::-1])

    def test_matches_sequential_backward(self):
        from blf_tpu.mpc.riccati import parallel_value_general

        prob = self._problem()
        Vxs_ref, Vxxs_ref = self._sequential(*prob)
        Vxs, Vxxs = parallel_value_general(*prob)
        np.testing.assert_allclose(np.asarray(Vxs), Vxs_ref,
                                   atol=tol(1e-8, 1e-3))
        np.testing.assert_allclose(np.asarray(Vxxs), Vxxs_ref,
                                   atol=tol(1e-8, 1e-3))

    def test_reduces_to_plain_lqr(self):
        """No cross/linear terms: the general pass must equal solve_lqr's
        parallel value function."""
        from blf_tpu.mpc.riccati import parallel_value_general, solve_lqr

        rng = np.random.default_rng(3)
        T, nx, nu = 16, 4, 2
        Fs = jnp.asarray(np.stack([np.eye(nx) + 0.05 * rng.normal(size=(nx, nx))
                                   for _ in range(T)]))
        Ls = jnp.asarray(rng.normal(size=(T, nx, nu)) * 0.3)
        Qs = jnp.asarray(np.stack([np.eye(nx)] * T))
        Rs = jnp.asarray(np.stack([np.eye(nu) * 0.5] * T))
        QT = jnp.asarray(np.eye(nx) * 5.0)
        cs = jnp.zeros((T, nx))
        x0 = jnp.asarray(rng.normal(size=nx))
        ref = solve_lqr(Fs, cs, Ls, Qs, Rs, QT, x0, parallel=True)
        Vxs, Vxxs = parallel_value_general(
            Fs, Ls, jnp.zeros((T, nx)), jnp.zeros((T, nu)), Qs, Rs,
            jnp.zeros((T, nu, nx)), jnp.zeros(nx), QT)
        np.testing.assert_allclose(np.asarray(Vxxs), np.asarray(
            ref.value_matrices), atol=tol(1e-8, 1e-4))
