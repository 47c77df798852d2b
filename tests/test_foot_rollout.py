"""Rigid-foot contact rollout: XLA/Pallas parity + physics ground truths.

Mirrors the reference's verification style (SURVEY.md §4): the integrated
spring-damper foot must settle to the analytic static equilibrium, and the
fused kernel must reproduce the ``lax.scan`` path on the same math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blf_tpu.models.contact import ContactParams, ContactState, contact_wrench
from blf_tpu.models.foot import (FootParams, FootState, foot_dynamics,
                                 foot_rollout)

DTYPE = jnp.float32


def make_problem(B=256, seed=0, dtype=DTYPE):
    cparams = ContactParams(
        length=jnp.asarray(0.2, dtype), width=jnp.asarray(0.1, dtype),
        spring_coeff=jnp.asarray(2e5, dtype),
        damper_coeff=jnp.asarray(2e3, dtype),
    )
    fparams = FootParams(
        mass=jnp.asarray(0.75, dtype),
        inertia=jnp.asarray([2e-3, 4e-3, 5e-3], dtype),
        baumgarte_rho=jnp.asarray(10.0, dtype),
    )
    rng = np.random.default_rng(seed)
    from blf_tpu.ops.lie import so3_exp

    rotvec = jnp.asarray(rng.normal(0, 0.02, (B, 3)), dtype)
    state = FootState(
        position=jnp.asarray(rng.normal(0, 1e-3, (B, 3)), dtype),
        rotation=so3_exp(rotvec),
        linear_velocity=jnp.asarray(rng.normal(0, 0.05, (B, 3)), dtype),
        angular_velocity=jnp.asarray(rng.normal(0, 0.05, (B, 3)), dtype),
    )
    null_position = jnp.zeros((B, 3), dtype)
    null_rotation = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3))
    return cparams, fparams, state, null_position, null_rotation


class TestFootRollout:
    def test_settles_to_static_equilibrium(self):
        """Damped settling: p_z → p0_z − m g /(k A), velocities → 0, R → I
        (the closed-loop analogue of the reference's integrator ground-truth
        checks, IntegratorTest.cpp:54-125)."""
        cp, fp, state, p0, R0 = make_problem(B=64)
        final = jax.jit(
            lambda s: foot_rollout(cp, fp, s, p0, R0, dt=1e-3, steps=4000)
        )(state)
        area = float(cp.length * cp.width)
        sink = float(fp.mass) * 9.81 / (float(cp.spring_coeff) * area)
        np.testing.assert_allclose(
            np.asarray(final.position[:, 2]), -sink, atol=1e-4)
        assert float(jnp.abs(final.linear_velocity).max()) < 1e-4
        assert float(jnp.abs(final.angular_velocity).max()) < 1e-3
        eye = jnp.broadcast_to(jnp.eye(3, dtype=DTYPE), final.rotation.shape)
        assert float(jnp.abs(final.rotation - eye).max()) < 1e-3

    def test_equilibrium_wrench_balances_gravity(self):
        """At the settled state the patch wrench equals the foot's weight."""
        cp, fp, state, p0, R0 = make_problem(B=8)
        final = foot_rollout(cp, fp, state, p0, R0, dt=1e-3, steps=4000)
        w = contact_wrench(cp, ContactState(
            position=final.position, rotation=final.rotation,
            linear_velocity=final.linear_velocity,
            angular_velocity=final.angular_velocity,
            null_position=p0, null_rotation=R0,
        ))
        np.testing.assert_allclose(
            np.asarray(w[:, 2]), float(fp.mass) * 9.81, rtol=1e-3)
        assert float(jnp.abs(w[:, :2]).max()) < 1e-2

    def test_dynamics_matches_contact_model(self):
        """foot_dynamics' wrench term is exactly models.contact.contact_wrench
        (regression guard on the hand-inlined kernel formulas)."""
        cp, fp, state, p0, R0 = make_problem(B=8)
        d = foot_dynamics(cp, fp, state, p0, R0)
        w = contact_wrench(cp, ContactState(
            position=state.position, rotation=state.rotation,
            linear_velocity=state.linear_velocity,
            angular_velocity=state.angular_velocity,
            null_position=p0, null_rotation=R0,
        ))
        g = jnp.asarray([0.0, 0.0, -9.81], DTYPE)
        np.testing.assert_allclose(
            np.asarray(d.linear_velocity),
            np.asarray(w[:, :3] / fp.mass + g), rtol=1e-6, atol=1e-6)

    def test_pallas_matches_xla(self):
        """Fused kernel (interpret mode on CPU) vs lax.scan path: identical
        math, componentwise op order — f32 agreement to ~1e-5 after 300
        stiff-contact steps."""
        cp, fp, state, p0, R0 = make_problem(B=256)
        args = dict(dt=1e-3, steps=300)
        ref = foot_rollout(cp, fp, state, p0, R0, backend="xla", **args)
        fused = foot_rollout(cp, fp, state, p0, R0, backend="pallas", **args)
        for name in FootState._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(fused, name)),
                np.asarray(getattr(ref, name)),
                atol=2e-5, err_msg=name)

    def test_pallas_pads_odd_batches(self):
        """ADVICE r3 regression: B % 8 != 0 batches must pad (replicating a
        lane, discarding the tail) instead of raising."""
        cp, fp, state, p0, R0 = make_problem(B=13)
        args = dict(dt=1e-3, steps=50)
        ref = foot_rollout(cp, fp, state, p0, R0, backend="xla", **args)
        fused = foot_rollout(cp, fp, state, p0, R0, backend="pallas", **args)
        for name in FootState._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(fused, name)),
                np.asarray(getattr(ref, name)),
                atol=2e-5, err_msg=name)

    def test_pallas_per_lane_stiffness(self):
        """Per-lane (B,) spring/damper coefficients (identification sweeps)."""
        cp, fp, state, p0, R0 = make_problem(B=256)
        rng = np.random.default_rng(3)
        k = jnp.asarray(rng.uniform(1e5, 3e5, (256, 1)), DTYPE)
        b = jnp.asarray(rng.uniform(1e3, 3e3, (256, 1)), DTYPE)
        cpl = cp._replace(spring_coeff=k, damper_coeff=b)
        ref = foot_rollout(cpl, fp, state, p0, R0, dt=1e-3, steps=200)
        fused = foot_rollout(cpl, fp, state, p0, R0, dt=1e-3, steps=200,
                             backend="pallas")
        np.testing.assert_allclose(np.asarray(fused.position),
                                   np.asarray(ref.position), atol=2e-5)

    def test_traced_under_jit_and_grad(self):
        """The XLA path composes with jit+grad (policy-learning readiness)."""
        cp, fp, state, p0, R0 = make_problem(B=4)

        def loss(k):
            cpl = cp._replace(spring_coeff=k)
            out = foot_rollout(cpl, fp, state, p0, R0, dt=1e-3, steps=50)
            return jnp.sum(out.position[:, 2] ** 2)

        g = jax.jit(jax.grad(loss))(cp.spring_coeff)
        assert np.isfinite(float(g))
