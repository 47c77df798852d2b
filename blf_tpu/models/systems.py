"""Continuous-time dynamical systems as pure functions.

Re-design of the reference's ``System`` component (SURVEY.md §2 row 7): each
``DynamicalSystem`` subclass with mutable tuple state
(``System/DynamicalSystem.h:32-104``) becomes a parameter NamedTuple plus a
pure ``f(state, input, t) -> dstate`` compatible with
:mod:`blf_tpu.ops.integrators`. All functions broadcast over leading batch
axes; `vmap` gives scenario batching.

Systems provided here:

- :func:`lti_dynamics` — ``LinearTimeInvariantSystem``
  (``LinearTimeInvariantSystem.cpp:42-74``).
- :func:`floating_base_kinematics` — ``FloatingBaseSystemKinematics``
  (``FloatingBaseSystemKinematics.cpp:36-73``): mixed-representation base
  twist, SO(3) Baumgarte-stabilised rotation rate.

The full articulated ``FloatingBaseDynamicalSystem`` lives in
:mod:`blf_tpu.models.rigid_body` (it needs the rigid-body engine).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from blf_tpu.ops.lie import so3_baumgarte_rate

__all__ = [
    "LTIParams",
    "lti_dynamics",
    "FloatingBaseKinState",
    "FloatingBaseKinInput",
    "floating_base_kinematics",
]


class LTIParams(NamedTuple):
    """``ẋ = A x + B u`` matrices (``LinearTimeInvariantSystem.h:35-69``)."""

    A: jnp.ndarray  # (…, n, n)
    B: jnp.ndarray  # (…, n, m)

    def validate(self) -> "LTIParams":
        """Shape checks the reference does at ``setSystemMatrices``
        (``LinearTimeInvariantSystem.cpp:13-38``)."""
        A, B = jnp.asarray(self.A), jnp.asarray(self.B)
        if A.shape[-1] != A.shape[-2]:
            raise ValueError("A must be square")
        if A.shape[-2] != B.shape[-2]:
            raise ValueError("A and B must have the same number of rows")
        return LTIParams(A, B)


def lti_dynamics(params: LTIParams, x: jnp.ndarray, u: jnp.ndarray, t=0.0):
    """``dx = A x + B u`` (``LinearTimeInvariantSystem.cpp:42-74``)."""
    del t
    return (
        jnp.einsum("...ij,...j->...i", params.A, x)
        + jnp.einsum("...ij,...j->...i", params.B, u)
    )


class FloatingBaseKinState(NamedTuple):
    """State tuple of ``FloatingBaseSystemKinematics`` (p, R, s)
    (``FloatingBaseSystemKinematics.h:42-75``)."""

    position: jnp.ndarray        # (…, 3) world base position
    rotation: jnp.ndarray        # (…, 3, 3) world_R_base
    joint_positions: jnp.ndarray  # (…, n)


class FloatingBaseKinInput(NamedTuple):
    """Input tuple (base twist in mixed representation, joint velocities)."""

    base_twist: jnp.ndarray       # (…, 6) [v; ω]
    joint_velocities: jnp.ndarray  # (…, n)


def floating_base_kinematics(
    state: FloatingBaseKinState,
    inp: FloatingBaseKinInput,
    t=0.0,
    *,
    rho: float = 0.0,
) -> FloatingBaseKinState:
    """Floating-base kinematics ``(ṗ, Ṙ, ṡ)`` with Baumgarte stabilisation.

    Mirrors ``FloatingBaseSystemKinematics::dynamics``
    (``FloatingBaseSystemKinematics.cpp:36-73``): ``ṗ = v``,
    ``Ṙ = ω̂R + ρ/2((RRᵀ)⁻¹ − I)R``, ``ṡ = input joint velocity``. ``rho`` is
    the ``"rho"`` config parameter read in ``initalize``
    (``FloatingBaseSystemKinematics.cpp:13-34``).
    """
    del t
    v = inp.base_twist[..., :3]
    omega = inp.base_twist[..., 3:]
    return FloatingBaseKinState(
        position=v,
        rotation=so3_baumgarte_rate(state.rotation, omega, rho),
        joint_positions=inp.joint_velocities,
    )
