"""Fixed-step ODE integrators over arbitrary pytree states.

TPU-native re-design of the reference's integrator stack
(``System/Integrator.h:28-74``, ``FixedStepIntegrator.tpp:22-72``,
``ForwardEuler.tpp:18-49``): instead of a class hierarchy mutating member
buffers, a dynamics function is a **pure function**

    ``f(state, input, t) -> dstate``

where ``state``/``input``/``dstate`` are pytrees (the reference's
``std::tuple`` states map to NamedTuples, SURVEY.md §7), and the reference's
tuple-recursive Euler update ``x += dx·dT`` (``ForwardEuler.h:42-50``)
becomes a ``tree_map``. The hot loop (``FixedStepIntegrator.tpp:48-61``)
becomes ``jax.lax.scan``, so a whole rollout is one fused XLA program and
``vmap`` adds scenario batching for free.

Euler matches the reference; midpoint/RK4 are the "RK variants = different
step functions" extension planned in SURVEY.md §7.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "forward_euler_step",
    "midpoint_step",
    "rk4_step",
    "STEP_FUNCTIONS",
    "integrate",
    "integrate_rosenbrock",
    "rosenbrock_operator",
]

DynamicsFn = Callable[[Any, Any, jnp.ndarray], Any]


def _axpy(x, dx, a):
    """``x + a·dx`` leaf-wise — the reference's ``addArea`` (``ForwardEuler.h:42-50``)."""
    return jax.tree_util.tree_map(lambda xi, di: xi + a * di, x, dx)


def forward_euler_step(f: DynamicsFn, x, u, t, dt):
    """Explicit Euler ``x ← x + dT·f(x, u, t)`` (``ForwardEuler.tpp:19-41``)."""
    return _axpy(x, f(x, u, t), dt)


def midpoint_step(f: DynamicsFn, x, u, t, dt):
    """Explicit midpoint (RK2); input held zero-order."""
    k1 = f(x, u, t)
    k2 = f(_axpy(x, k1, dt / 2), u, t + dt / 2)
    return _axpy(x, k2, dt)


def rk4_step(f: DynamicsFn, x, u, t, dt):
    """Classic RK4; input held zero-order across substeps."""
    k1 = f(x, u, t)
    k2 = f(_axpy(x, k1, dt / 2), u, t + dt / 2)
    k3 = f(_axpy(x, k2, dt / 2), u, t + dt / 2)
    k4 = f(_axpy(x, k3, dt), u, t + dt)
    ksum = jax.tree_util.tree_map(
        lambda a, b, c, d: a + 2 * b + 2 * c + d, k1, k2, k3, k4
    )
    return _axpy(x, ksum, dt / 6)


STEP_FUNCTIONS = {
    "euler": forward_euler_step,
    "midpoint": midpoint_step,
    "rk4": rk4_step,
}


def integrate(
    f: DynamicsFn,
    x0,
    *,
    dt: float,
    num_steps: int,
    us=None,
    u=None,
    t0: float = 0.0,
    method: str = "euler",
    save_trajectory: bool = False,
    unroll: int = 1,
):
    """Integrate ``ẋ = f(x, u, t)`` for ``num_steps`` fixed steps of ``dt``.

    Equivalent of ``FixedStepIntegrator::integrate(t0, tf)``
    (``FixedStepIntegrator.tpp:22-72``) with the loop lowered to
    ``jax.lax.scan``.

    Args:
      f: pure dynamics ``f(state, input, t) -> dstate`` over matching pytrees.
      x0: initial state pytree.
      dt: step size (the reference validates ``dt > 0``; here it is static).
      num_steps: static step count (``⌈(tf−t0)/dT⌉`` in the reference).
      us: optional time-varying input pytree whose leaves carry a leading
        ``num_steps`` axis (one input per step).
      u: optional constant input pytree (zero-order hold); mutually exclusive
        with ``us``.
      t0: initial time.
      method: one of ``STEP_FUNCTIONS``.
      save_trajectory: if True also return the state trajectory including
        ``x0`` (leaves get a leading ``num_steps + 1`` axis).
      unroll: scan unroll factor (TPU pipelining knob).

    Returns:
      ``x_final`` or ``(x_final, trajectory)``.
    """
    if method not in STEP_FUNCTIONS:
        raise ValueError(f"unknown method {method!r}; pick from {sorted(STEP_FUNCTIONS)}")
    if us is not None and u is not None:
        raise ValueError("pass either `us` (per-step) or `u` (constant), not both")
    step = STEP_FUNCTIONS[method]
    dt = jnp.asarray(dt)
    t0 = jnp.asarray(t0)

    def body(carry, u_k):
        x, k = carry
        t = t0 + k * dt
        u_eff = u if us is None else u_k
        x_next = step(f, x, u_eff, t, dt)
        y = x_next if save_trajectory else None
        return (x_next, k + 1), y

    xs = us if us is not None else jnp.zeros((num_steps, 0))
    (x_final, _), traj = jax.lax.scan(body, (x0, jnp.asarray(0, dt.dtype)), xs, unroll=unroll)
    if save_trajectory:
        traj = jax.tree_util.tree_map(
            lambda x0_leaf, tr: jnp.concatenate([x0_leaf[None], tr], axis=0), x0, traj
        )
        return x_final, traj
    return x_final


def integrate_rosenbrock(
    f: DynamicsFn,
    x0,
    *,
    dt: float,
    num_steps: int,
    u=None,
    t0: float = 0.0,
    gamma: Optional[float] = None,
    operator: Optional[jnp.ndarray] = None,
    unroll: int = 1,
):
    """Stiff integrator: 2nd-order Rosenbrock-W (ROS2) with a **frozen**
    state Jacobian, L-stable in the linearized modes.

    The reference integrates its stiff contact-closed dynamics with small
    explicit steps (``FixedStepIntegrator.tpp:48-61`` — the only stability
    lever it has is ``dT``). On TPU that strategy is ruinous: each explicit
    substep of an articulated plant is a long serial chain of small ops, and
    the sole-ground spring–damper modes (|λ| ≈ 3e3/s on a 0.6 kg foot) force
    sub-millisecond steps. This method instead treats those modes through
    the Jacobian:

        J  = ∂f/∂x at ``x0``           (one ``jacfwd`` — a 64-wide tangent
                                        batch, vectorized, NOT 64 serial
                                        evals)
        M⁻¹ = (I − γ·dt·J)⁻¹           (one batched inverse, reused by
                                        every substep)
        k₁ = M⁻¹ f(x)
        k₂ = M⁻¹ (f(x + dt·k₁) − 2 k₁)
        x⁺ = x + dt·(3 k₁ + k₂)/2      (γ = 1 + 1/√2 → R(∞) = 0, order 2)

    so each substep costs two dynamics evaluations plus two (D, D) matvecs —
    MXU/VPU work — instead of four RK4 evaluations at a ~10× smaller stable
    ``dt``. Freezing J across the call (a "W-method") preserves the linear
    stability of the stiff contact modes, which change on pose timescales
    (~cm of foot travel), not per-substep; accuracy vs a fine-step RK4
    reference is pinned by ``tests/test_integrators.py`` on the humanoid
    plant.

    Args mirror :func:`integrate` (constant input ``u`` only — the WBC tick
    holds torques zero-order). The state pytree is flattened with
    ``ravel_pytree``; works under ``vmap``. Pass ``operator`` (from
    :func:`rosenbrock_operator`) to reuse a lagged stage operator across
    calls instead of recomputing J at ``x0``.
    """
    from jax.flatten_util import ravel_pytree

    if gamma is None:
        gamma = 1.0 + 2.0 ** -0.5
    flat0, unravel = ravel_pytree(x0)
    dtype = flat0.dtype
    dt = jnp.asarray(dt, dtype)
    t0 = jnp.asarray(t0, dtype)

    def ff(v, t):
        return ravel_pytree(f(unravel(v), u, t))[0]

    if operator is None:
        operator = rosenbrock_operator(f, x0, u=u, dt=dt, t0=t0, gamma=gamma)
    Minv = operator

    def body(carry, _):
        v, k = carry
        t = t0 + k * dt
        k1 = Minv @ ff(v, t)
        k2 = Minv @ (ff(v + dt * k1, t + dt) - 2.0 * k1)
        return (v + dt * (1.5 * k1 + 0.5 * k2), k + 1), None

    (v_final, _), _ = jax.lax.scan(
        body, (flat0, jnp.asarray(0, dtype)), None, length=num_steps,
        unroll=unroll,
    )
    return unravel(v_final)


def rosenbrock_operator(
    f: DynamicsFn,
    x,
    *,
    u=None,
    dt,
    t0=0.0,
    gamma: Optional[float] = None,
) -> jnp.ndarray:
    """Precompute the ROS2 stage operator ``(I − γ·dt·J)⁻¹`` at state ``x``.

    Pass the result as ``operator=`` to :func:`integrate_rosenbrock` to
    amortize the Jacobian + inverse across several calls (e.g. one operator
    per control tick reused by every substep window — the W-method lets the
    Jacobian lag the state as long as the stiff modes it stabilizes move on
    slower timescales). ``dt`` must match the substep size of the consuming
    calls.
    """
    from jax.flatten_util import ravel_pytree

    if gamma is None:
        gamma = 1.0 + 2.0 ** -0.5
    flat, unravel = ravel_pytree(x)
    dtype = flat.dtype
    D = flat.shape[0]

    def ff(v):
        return ravel_pytree(f(unravel(v), u, jnp.asarray(t0, dtype)))[0]

    J = jax.jacfwd(ff)(flat)                               # (D, D)
    eye = jnp.eye(D, dtype=dtype)
    return jnp.linalg.inv(eye - (jnp.asarray(gamma, dtype)
                                 * jnp.asarray(dt, dtype)) * J)
