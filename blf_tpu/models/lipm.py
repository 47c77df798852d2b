"""Linear Inverted Pendulum + Divergent Component of Motion models.

These are the new-component models SURVEY.md §7 requires ("DCM/LIPM model
library" — no reference counterpart in the v0.0.1 snapshot, but the substrate
of the upstream ``TimeVaryingDCMPlanner`` the BASELINE.json north star
targets). Continuous dynamics:

- LIPM: ``ẍ = ω² (x − z)`` with ``ω = √(g/z_c)``, ``x`` the CoM ground
  projection and ``z`` the ZMP.
- DCM: ``ξ = x + ẋ/ω`` splits the LIPM into the unstable flow
  ``ξ̇ = ω (ξ − z)`` and the stable CoM tracker ``ẋ = ω (ξ − x)``.

Everything is closed-form exponential (exact ZOH discretisation), batched
over leading axes, and dtype-generic.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "LIPMParams",
    "lipm_omega",
    "dcm_dynamics",
    "com_dynamics",
    "dcm_discrete_step",
    "com_discrete_step",
    "dcm_backward_recursion",
    "dcm_reference_trajectory",
    "com_trajectory_from_dcm",
]


class LIPMParams(NamedTuple):
    """Static pendulum parameters."""

    com_height: jnp.ndarray  # z_c [m]
    gravity: jnp.ndarray     # g [m/s²]


def lipm_omega(params: LIPMParams):
    """Natural frequency ``ω = √(g/z_c)``."""
    return jnp.sqrt(params.gravity / params.com_height)


def dcm_dynamics(params: LIPMParams, dcm, zmp):
    """``ξ̇ = ω (ξ − z)`` (unstable first-order flow)."""
    return lipm_omega(params) * (dcm - zmp)


def com_dynamics(params: LIPMParams, com, dcm):
    """``ẋ = ω (ξ − x)`` (stable first-order tracker)."""
    return lipm_omega(params) * (dcm - com)


def dcm_discrete_step(params: LIPMParams, dcm, zmp, dt):
    """Exact ZOH step: ``ξ⁺ = z + e^{ω dt} (ξ − z)`` (z constant over dt)."""
    a = jnp.exp(lipm_omega(params) * dt)
    return zmp + a * (dcm - zmp)


def com_discrete_step(params: LIPMParams, com, dcm, zmp, dt):
    """Exact CoM step under the coupled flow with constant z over dt.

    With ``ξ(t)`` evolving exponentially, ``ẋ = ω(ξ − x)`` has solution
    ``x⁺ = z + e^{−ω dt}(x − z) + sinh(ω dt) e^{−ω dt} (ξ − z) · e^{ω dt} / 1``…
    computed here by exact integration of the 2×2 linear system in (x, ξ).
    """
    w = lipm_omega(params)
    em, ep = jnp.exp(-w * dt), jnp.exp(w * dt)
    # x(t) = z + e^{-wt}(x0 - z) + (ξ0 - z) (e^{wt} - e^{-wt})/2
    return zmp + em * (com - zmp) + 0.5 * (ep - em) * (dcm - zmp)


def dcm_backward_recursion(params: LIPMParams, zmp_knots, dcm_final, dt):
    """Classic DCM boundary recursion: given per-knot ZMP plan ``z_k``
    ``(T, 2)`` and terminal ``ξ_T``, return the reference ``ξ_k`` ``(T+1, 2)``
    with ``ξ_k = z_k + e^{−ω dt}(ξ_{k+1} − z_k)`` — the step-plan seed the
    upstream TimeVaryingDCMPlanner refines."""
    a = jnp.exp(-lipm_omega(params) * dt)

    def body(carry, z_k):
        xi_next = carry
        xi_k = z_k + a * (xi_next - z_k)
        return xi_k, xi_k

    _, xis = jax.lax.scan(body, dcm_final, zmp_knots, reverse=True)
    return jnp.concatenate([xis, dcm_final[None]], axis=0)


def dcm_reference_trajectory(params: LIPMParams, footholds, durations, dt):
    """Piecewise-constant-ZMP reference: ``footholds`` ``(S, 2)`` with per-step
    ``durations`` ``(S,)`` (seconds, multiples of dt). Returns (zmp_knots
    ``(T, 2)``, dcm_ref ``(T+1, 2)``) with the DCM ending on the final foothold."""
    import numpy as np

    reps = np.asarray(np.round(np.asarray(durations) / dt), dtype=int)
    zmp = jnp.repeat(jnp.asarray(footholds), jnp.asarray(reps), axis=0,
                     total_repeat_length=int(reps.sum()))
    dcm_ref = dcm_backward_recursion(params, zmp, jnp.asarray(footholds)[-1], dt)
    return zmp, dcm_ref


def com_trajectory_from_dcm(params: LIPMParams, com0, dcm_traj, zmp_knots, dt):
    """Integrate the stable CoM flow exactly along a DCM/ZMP trajectory.

    ``dcm_traj``: (…, T+1, 2); ``zmp_knots``: (…, T, 2) → CoM (…, T+1, 2).
    Batch axes allowed (time is scanned, batch rides along).
    """

    def body(x, inputs):
        xi, z = inputs
        x_next = com_discrete_step(params, x, xi, z, dt)
        return x_next, x_next

    xis = jnp.moveaxis(dcm_traj[..., :-1, :], -2, 0)
    zs = jnp.moveaxis(zmp_knots, -2, 0)
    # merge varying mesh axes of the inputs into the carry (shard_map typing)
    com0 = com0 + 0 * xis[0] + 0 * zs[0]
    _, xs = jax.lax.scan(body, com0, (xis, zs))
    return jnp.concatenate(
        [com0[..., None, :], jnp.moveaxis(xs, 0, -2)], axis=-2
    )
