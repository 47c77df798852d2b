"""Lie-group math tests (substrate for the reference's iDynTree spatial types)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tol
from scipy.spatial.transform import Rotation as ScipyRot

from blf_tpu.ops import lie

RNG = np.random.default_rng(42)


def random_rotvecs(n):
    axes = RNG.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    return axes * RNG.uniform(0.1, np.pi - 0.1, size=(n, 1))


class TestSkew:
    def test_skew_cross_identity(self):
        v = jnp.asarray(RNG.normal(size=(5, 3)))
        u = jnp.asarray(RNG.normal(size=(5, 3)))
        np.testing.assert_allclose(
            np.einsum("bij,bj->bi", lie.skew(v), u), np.cross(v, u), atol=tol(1e-12, 1e-6)
        )

    def test_unskew_roundtrip(self):
        v = jnp.asarray(RNG.normal(size=(4, 3)))
        np.testing.assert_allclose(lie.unskew(lie.skew(v)), v, atol=tol(1e-12, 1e-6))


class TestExpLog:
    def test_exp_matches_scipy(self):
        w = random_rotvecs(16)
        np.testing.assert_allclose(
            lie.so3_exp(jnp.asarray(w)), ScipyRot.from_rotvec(w).as_matrix(), atol=tol(1e-10, 1e-6)
        )

    def test_exp_small_angle(self):
        w = np.array([[1e-9, -2e-9, 3e-10], [0.0, 0.0, 0.0]])
        R = lie.so3_exp(jnp.asarray(w))
        np.testing.assert_allclose(R, ScipyRot.from_rotvec(w).as_matrix(), atol=tol(1e-12, 1e-6))

    def test_log_roundtrip(self):
        w = random_rotvecs(16)
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(jnp.asarray(w))), w, atol=tol(1e-8, 1e-5))

    def test_exp_is_differentiable_at_zero(self):
        g = jax.jacobian(lambda w: lie.so3_exp(w))(jnp.zeros(3))
        # d/dw exp(w) at 0 is the generator basis: dR/dw_k = skew(e_k)
        expected = np.stack([lie.skew(np.eye(3)[k]) for k in range(3)], axis=-1)
        np.testing.assert_allclose(g, expected, atol=1e-6)


class TestRotationConversions:
    def test_rpy_matches_scipy_zyx(self):
        # iDynTree RPY = Rz(yaw) Ry(pitch) Rx(roll) (ContinousContactModelTest.cpp:36)
        r, p, y = -0.15, 0.2, 0.1
        np.testing.assert_allclose(
            lie.rpy_to_rot(r, p, y),
            ScipyRot.from_euler("ZYX", [y, p, r]).as_matrix(),
            atol=tol(1e-12, 1e-6),
        )

    def test_quat_roundtrip(self):
        w = random_rotvecs(32)
        R = lie.so3_exp(jnp.asarray(w))
        np.testing.assert_allclose(lie.quat_to_rot(lie.rot_to_quat(R)), R, atol=tol(1e-9, 1e-6))


class TestBaumgarte:
    def test_rate_on_so3_is_pure_rotation(self):
        # On the manifold the correction vanishes: Ṙ = ω̂ R exactly.
        R = jnp.asarray(ScipyRot.from_rotvec(random_rotvecs(3)).as_matrix())
        omega = jnp.asarray(RNG.normal(size=(3, 3)))
        np.testing.assert_allclose(
            lie.so3_baumgarte_rate(R, omega, rho=5.0),
            lie.rotation_rate_mixed(R, omega),
            atol=tol(1e-9, 1e-6),
        )

    def test_correction_restores_orthonormality(self):
        # Perturb off the manifold, integrate with omega = 0: RRᵀ must flow to I.
        R = jnp.eye(3) + 0.05 * jnp.asarray(RNG.normal(size=(3, 3)))
        rho, dt = 10.0, 0.01
        for _ in range(2000):
            R = R + dt * lie.so3_baumgarte_rate(R, jnp.zeros(3), rho)
        np.testing.assert_allclose(R @ R.T, jnp.eye(3), atol=1e-6)


class TestSE3:
    def test_compose_apply_inverse(self):
        Ra = jnp.asarray(ScipyRot.from_rotvec(random_rotvecs(1)[0]).as_matrix())
        Rb = jnp.asarray(ScipyRot.from_rotvec(random_rotvecs(1)[0]).as_matrix())
        pa, pb = jnp.asarray(RNG.normal(size=3)), jnp.asarray(RNG.normal(size=3))
        x = jnp.asarray(RNG.normal(size=3))
        Rc, pc = lie.se3_compose(Ra, pa, Rb, pb)
        np.testing.assert_allclose(
            lie.se3_apply(Rc, pc, x),
            lie.se3_apply(Ra, pa, lie.se3_apply(Rb, pb, x)),
            atol=tol(1e-12, 1e-6),
        )
        Ri, pi = lie.se3_inverse(Ra, pa)
        np.testing.assert_allclose(
            lie.se3_apply(Ri, pi, lie.se3_apply(Ra, pa, x)), x, atol=tol(1e-12, 1e-6)
        )
