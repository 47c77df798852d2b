"""Pipeline-parallel combinator tests (SURVEY.md §2.3 PP row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blf_tpu.parallel.pipeline import pipeline_stages


def make_mesh(n):
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:n]), ("stage",))


class TestPipeline:
    @pytest.mark.parametrize("n_stages,M", [(2, 5), (4, 7), (8, 3)])
    def test_matches_serial_composition(self, n_stages, M):
        rng = np.random.default_rng(n_stages)
        mats = [jnp.asarray(rng.normal(size=(6, 6)) * 0.4)
                for _ in range(n_stages)]

        def mk(W):
            return lambda x: jnp.tanh(x @ W)

        fns = [mk(W) for W in mats]
        mesh = make_mesh(n_stages)
        piped = pipeline_stages(fns, mesh, "stage")
        xs = jnp.asarray(rng.normal(size=(M, 6)))
        got = piped(xs)
        want = xs
        for f in fns:
            want = f(want)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)

    def test_pytree_carrier_and_jit(self):
        """Carrier can be a pytree; the whole schedule jits to one program."""
        mesh = make_mesh(4)

        def s0(c):
            return {"x": c["x"] + 1.0, "y": c["y"]}

        def s1(c):
            return {"x": c["x"], "y": c["y"] * 2.0}

        def s2(c):
            return {"x": c["x"] * c["y"], "y": c["y"]}

        def s3(c):
            return {"x": c["x"] - c["y"], "y": c["y"]}

        piped = jax.jit(pipeline_stages([s0, s1, s2, s3], mesh, "stage"))
        mbs = {"x": jnp.arange(6.0)[:, None] * jnp.ones((6, 4)),
               "y": jnp.ones((6, 4))}
        got = piped(mbs)
        want = s3(s2(s1(s0(mbs))))
        np.testing.assert_allclose(np.asarray(got["x"]),
                                   np.asarray(want["x"]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(got["y"]),
                                   np.asarray(want["y"]), atol=1e-12)

    def test_stage_count_mismatch(self):
        mesh = make_mesh(4)
        with pytest.raises(ValueError, match="stage fns"):
            pipeline_stages([lambda x: x] * 3, mesh, "stage")

    def test_mpc_flavored_stages(self):
        """Rollout → linearize → factor-ish → solve-ish staged pipeline:
        heterogeneous compute per stage on a shared carrier."""
        mesh = make_mesh(4)
        nx = 4

        def rollout(c):
            A, x, rhs = c
            xs = x
            for _ in range(3):
                xs = jnp.tanh(A @ xs)
            return (A, xs, rhs)

        def linearize(c):
            A, x, rhs = c
            J = A * (1.0 - jnp.tanh(A @ x)[:, None] ** 2)
            return (J, x, rhs)

        def factor(c):
            J, x, rhs = c
            K = J @ J.T + jnp.eye(nx)
            return (K, x, rhs)

        def solve(c):
            K, x, rhs = c
            return (K, jnp.linalg.solve(K, rhs), rhs)

        fns = [rollout, linearize, factor, solve]
        piped = pipeline_stages(fns, mesh, "stage")
        rng = np.random.default_rng(0)
        M = 6
        mbs = (
            jnp.asarray(rng.normal(size=(M, nx, nx)) * 0.3),
            jnp.asarray(rng.normal(size=(M, nx))),
            jnp.asarray(rng.normal(size=(M, nx))),
        )
        got = piped(mbs)
        for m in range(M):
            want = (mbs[0][m], mbs[1][m], mbs[2][m])
            for f in fns:
                want = f(want)
            np.testing.assert_allclose(np.asarray(got[1][m]),
                                       np.asarray(want[1]), atol=1e-10)
