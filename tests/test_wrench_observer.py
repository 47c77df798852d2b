"""Momentum-based contact wrench observer (blf_tpu.estimators.wrench_observer).

Verification mirrors the reference's test style (SURVEY.md §4): simulate the
REAL articulated dynamics with a known injected external wrench, then check
the observer (which sees only states + commanded torques) recovers it —
statistical-convergence pattern #5, plus a discrimination test (zero input →
zero residual) and batching equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tol

import blf_tpu.models.rigid_body as rb
from blf_tpu.estimators.wrench_observer import (
    init_momentum_observer,
    momentum_observer_scan,
    momentum_observer_step,
    wrenches_from_residual,
)
from blf_tpu.models.kinematics import (
    KinematicTreeBuilder,
    forward_kinematics,
    frame_jacobian,
)
from blf_tpu.ops.integrators import integrate
from blf_tpu.ops.lie import so3_exp

RNG = np.random.default_rng(7)


def three_link_chain():
    b = KinematicTreeBuilder(base_mass=3.0, base_com=(0.01, -0.02, 0.03),
                             base_inertia=np.diag([0.05, 0.06, 0.04]))
    b.add_link("l1", "base", axis=(0, 0, 1), joint_position=(0.1, 0.0, 0.0),
               mass=1.2, com=(0.05, 0.0, 0.02),
               inertia=np.diag([0.01, 0.012, 0.008]))
    b.add_link("l2", "l1", axis=(0, 1, 0), joint_position=(0.12, 0.0, 0.0),
               mass=0.8, com=(0.06, 0.01, 0.0),
               inertia=np.diag([0.006, 0.007, 0.005]))
    b.add_link("l3", "l2", axis=(1, 0, 0), joint_position=(0.0, 0.1, 0.0),
               mass=0.5, com=(0.0, 0.04, 0.01),
               inertia=np.diag([0.003, 0.004, 0.002]))
    b.add_frame("ee", "l3", position=(0.0, 0.08, 0.0))
    b.add_frame("hip", "base", position=(0.05, 0.0, 0.0))
    return b.finalize()


def initial_state(tree, vel_scale=0.3):
    n = tree.num_dofs
    return rb.FloatingBaseState(
        base_twist=jnp.asarray(RNG.uniform(-1, 1, 6) * vel_scale),
        joint_velocities=jnp.asarray(RNG.uniform(-1, 1, n) * vel_scale),
        base_position=jnp.asarray(RNG.uniform(-0.2, 0.2, 3)),
        base_rotation=so3_exp(jnp.asarray(RNG.uniform(-0.5, 0.5, 3))),
        joint_positions=jnp.asarray(RNG.uniform(-0.5, 0.5, n)),
    )


def simulate(tree, x0, wrench_by_frame, taus, dt, num_steps):
    """RK4 rollout of the true dynamics; returns sampled state trajectory
    (leading axis num_steps+1, includes x0)."""

    def f(state, tau, t):
        inp = rb.FloatingBaseInput(joint_torques=tau,
                                   contact_wrenches=wrench_by_frame)
        return rb.floating_base_dynamics(tree, state, inp, t, rho=1.0)

    _, traj = integrate(f, x0, dt=dt, num_steps=num_steps, us=taus,
                        method="rk4", save_trajectory=True)
    return traj


def run_observer(tree, traj, taus, gain, dt):
    """Feed the sampled trajectory to the observer; returns residuals (T, nv)."""
    x0 = jax.tree_util.tree_map(lambda a: a[0], traj)
    params, obs = init_momentum_observer(tree, x0, gain, dt)
    rest = jax.tree_util.tree_map(lambda a: a[1:], traj)
    _, residuals = momentum_observer_scan(tree, params, obs, rest, taus)
    return residuals


class TestDiscrimination:
    def test_zero_external_force_zero_residual(self):
        """Free motion under torques only: the residual must stay at the
        integration-noise floor even though the robot moves vigorously."""
        tree = three_link_chain()
        x0 = initial_state(tree)
        dt, T = 1e-3, 500
        taus = jnp.asarray(
            0.2 * np.sin(np.arange(T)[:, None] * dt * 5.0 + np.arange(3)[None, :])
        )
        traj = simulate(tree, x0, {}, taus, dt, T)
        residuals = run_observer(tree, traj, taus, gain=100.0, dt=dt)
        # scale: gravity alone is ~ m g ≈ 54 N on the base rows
        assert float(jnp.max(jnp.abs(residuals))) < 0.15


class TestWrenchRecovery:
    def test_constant_ee_wrench_recovered(self):
        """Inject a constant mixed wrench at the end-effector; the observer
        residual must converge to Jᵀw (1/K time constant) and the per-frame
        recovery must return w."""
        tree = three_link_chain()
        x0 = initial_state(tree, vel_scale=0.1)
        w_true = jnp.asarray([3.0, -2.0, 5.0, 0.2, -0.1, 0.15])
        dt, T, gain = 1e-3, 600, 120.0
        taus = jnp.zeros((T, tree.num_dofs))
        traj = simulate(tree, x0, {"ee": w_true}, taus, dt, T)
        residuals = run_observer(tree, traj, taus, gain=gain, dt=dt)

        # settle ≫ 1/K = 8.3 ms; compare against Jᵀw at the final sample
        x_end = jax.tree_util.tree_map(lambda a: a[-1], traj)
        poses = forward_kinematics(tree, x_end.base_position,
                                   x_end.base_rotation, x_end.joint_positions)
        J = frame_jacobian(tree, poses, "ee")
        tau_ext = J.T @ w_true
        err = jnp.max(jnp.abs(residuals[-1] - tau_ext))
        assert float(err) < 0.05 * float(jnp.max(jnp.abs(tau_ext)))

        f_hat = wrenches_from_residual(tree, x_end, ["ee"], residuals[-1])
        np.testing.assert_allclose(np.asarray(f_hat[0]), np.asarray(w_true),
                                   atol=0.12)

    def test_first_order_filter_dynamics(self):
        """The residual rise follows ṙ = K(τ_ext − r): after t = 3/K it must
        be within ~e⁻³ (+ lag effects) of the target; after 1/K more than
        half-way (coarse envelope check, not a fit)."""
        tree = three_link_chain()
        x0 = initial_state(tree, vel_scale=0.05)
        w_true = jnp.asarray([0.0, 0.0, 4.0, 0.0, 0.0, 0.0])
        dt, gain = 1e-3, 60.0
        T = int(6.0 / gain / dt)
        taus = jnp.zeros((T, tree.num_dofs))
        traj = simulate(tree, x0, {"ee": w_true}, taus, dt, T)
        residuals = run_observer(tree, traj, taus, gain=gain, dt=dt)

        def tau_ext_at(k):
            x = jax.tree_util.tree_map(lambda a: a[k], traj)
            poses = forward_kinematics(tree, x.base_position, x.base_rotation,
                                       x.joint_positions)
            return frame_jacobian(tree, poses, "ee").T @ w_true

        k1 = int(1.0 / gain / dt)          # one time constant
        k3 = int(3.0 / gain / dt)
        t1, t3 = tau_ext_at(k1), tau_ext_at(k3)
        ratio1 = float(jnp.linalg.norm(residuals[k1 - 1]) / jnp.linalg.norm(t1))
        ratio3 = float(jnp.linalg.norm(residuals[k3 - 1]) / jnp.linalg.norm(t3))
        assert 0.45 < ratio1 < 0.85        # 1 − e⁻¹ ≈ 0.63
        assert ratio3 > 0.9                # 1 − e⁻³ ≈ 0.95

    def test_step_api_matches_scan(self):
        tree = three_link_chain()
        x0 = initial_state(tree)
        dt, T = 1e-3, 50
        taus = jnp.zeros((T, tree.num_dofs))
        w = jnp.asarray([1.0, 0.0, 2.0, 0.0, 0.1, 0.0])
        traj = simulate(tree, x0, {"ee": w}, taus, dt, T)
        residuals = run_observer(tree, traj, taus, gain=80.0, dt=dt)

        params, obs = init_momentum_observer(
            tree, jax.tree_util.tree_map(lambda a: a[0], traj), 80.0, dt
        )
        outs = []
        for k in range(T):
            xk = jax.tree_util.tree_map(lambda a: a[k + 1], traj)
            obs, r = momentum_observer_step(tree, params, obs, xk, taus[k])
            outs.append(r)
        np.testing.assert_allclose(np.asarray(jnp.stack(outs)),
                                   np.asarray(residuals), rtol=0, atol=tol(1e-12, 1e-5))


class TestBatching:
    def test_vmap_fleet_matches_single(self):
        """A fleet of observers under different wrenches == per-lane runs."""
        tree = three_link_chain()
        x0 = initial_state(tree, vel_scale=0.1)
        dt, T, gain = 1e-3, 200, 100.0
        taus = jnp.zeros((T, tree.num_dofs))
        ws = jnp.asarray(RNG.uniform(-3, 3, (4, 6)))

        trajs = jax.vmap(lambda w: simulate(tree, x0, {"ee": w}, taus, dt, T))(ws)

        def run_one(traj):
            return run_observer(tree, traj, taus, gain=gain, dt=dt)

        batched = jax.vmap(run_one)(trajs)
        for i in range(ws.shape[0]):
            single = run_one(jax.tree_util.tree_map(lambda a: a[i], trajs))
            np.testing.assert_allclose(np.asarray(batched[i]),
                                       np.asarray(single), atol=tol(1e-10, 3e-5))

    def test_multi_frame_least_squares(self):
        """Two candidate frames (12 unknowns > 9 coordinates — the genuinely
        ambiguous multi-contact case): attribution is not identifiable, but
        the minimum-norm recovery must still be *consistent* — the stacked
        ``Σ J_fᵀ f̂_f`` reproduces the residual."""
        tree = three_link_chain()
        x0 = initial_state(tree, vel_scale=0.05)
        w_true = jnp.asarray([2.0, 1.0, -3.0, 0.1, 0.0, -0.05])
        dt, T, gain = 1e-3, 600, 120.0
        taus = jnp.zeros((T, tree.num_dofs))
        traj = simulate(tree, x0, {"ee": w_true}, taus, dt, T)
        residuals = run_observer(tree, traj, taus, gain=gain, dt=dt)
        x_end = jax.tree_util.tree_map(lambda a: a[-1], traj)
        # a base-mounted candidate frame + the true contact frame
        f_hat = wrenches_from_residual(tree, x_end, ["hip", "ee"],
                                       residuals[-1])
        poses = forward_kinematics(tree, x_end.base_position,
                                   x_end.base_rotation, x_end.joint_positions)
        recon = (frame_jacobian(tree, poses, "hip").T @ f_hat[0]
                 + frame_jacobian(tree, poses, "ee").T @ f_hat[1])
        np.testing.assert_allclose(np.asarray(recon),
                                   np.asarray(residuals[-1]), atol=tol(1e-6, 1e-4))
        # and with the true contact frame alone the wrench IS identifiable
        f_single = wrenches_from_residual(tree, x_end, ["ee"], residuals[-1])
        np.testing.assert_allclose(np.asarray(f_single[0]),
                                   np.asarray(w_true), atol=0.12)
