"""Gait planning: footstep schedules → support polygons → DCM-MPC inputs.

The composition layer for BASELINE config 3 ("TimeVaryingDCMPlanner full
gait: 10-step footstep sequence with ConvexHullHelper ZMP constraints"):

1. :func:`footstep_plan` authors an alternating-foot contact schedule using
   the reference-semantics :class:`blf_tpu.planners.contacts.ContactList`;
2. :func:`lower_contact_schedule` (reference ``ContactPhaseList`` lowering)
   turns it into dense per-knot masks/footholds;
3. :func:`support_polygons` runs the jittable monotone-chain hull over the
   active feet's corner points per knot (the ``ConvexHullHelper`` role,
   ``ConvexHullHelper.cpp:35-89``, batched on device) → padded half-spaces;
4. :func:`plan_gait` builds ZMP/DCM references and solves the batched
   DCM-MPC over the whole gait horizon.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from blf_tpu.models.lipm import LIPMParams, dcm_backward_recursion
from blf_tpu.mpc.dcm import DCMPlan, DCMWeights, solve_dcm_mpc
from blf_tpu.planners.contacts import (
    ContactList,
    ContactScheduleArrays,
    lower_contact_schedule,
)
from blf_tpu.planners.convex_hull import (
    halfspaces_from_polygon,
    monotone_chain_2d,
)

__all__ = ["footstep_plan", "support_polygons", "gait_references", "plan_gait"]


def footstep_plan(
    num_steps: int = 10,
    step_length: float = 0.15,
    step_width: float = 0.2,
    step_duration: float = 0.8,
    double_support: float = 0.2,
    start_position=(0.0, 0.0),
) -> dict:
    """Author an alternating left/right footstep schedule.

    Both feet start in stance; each step swings one foot forward by
    ``step_length`` (feet laterally separated by ``step_width``). Returns
    ``{"left": ContactList, "right": ContactList}`` with reference-exact
    overlap semantics (touching windows are rejected, so stance windows are
    kept strictly separated by the swing gap).
    """
    left = ContactList(default_name="left")
    right = ContactList(default_name="right")
    x0, y0 = start_position
    yl, yr = y0 + step_width / 2, y0 - step_width / 2

    # initial double stance
    t = 0.0
    first_stance_end = step_duration
    pos = {"left": np.array([x0, yl, 0.0]), "right": np.array([x0, yr, 0.0])}
    swing_order = ["left", "right"] * ((num_steps + 1) // 2)
    lists = {"left": left, "right": right}

    # each foot's stance windows: a foot stays in stance until it swings,
    # then lands step_length further ahead.
    stance_start = {"left": 0.0, "right": 0.0}
    for k, foot in enumerate(swing_order[:num_steps]):
        swing_start = first_stance_end + k * step_duration
        swing_end = swing_start + step_duration - double_support
        assert lists[foot].add_contact(
            position=pos[foot].copy(),
            activation_time=stance_start[foot],
            deactivation_time=swing_start,
        )
        pos[foot] = pos[foot] + np.array([step_length, 0.0, 0.0])
        stance_start[foot] = swing_end
    total = first_stance_end + num_steps * step_duration + step_duration
    for foot in ("left", "right"):
        assert lists[foot].add_contact(
            position=pos[foot].copy(),
            activation_time=stance_start[foot],
            deactivation_time=total,
        )
    return lists


_FOOT_CORNERS = np.array(
    [[1.0, 1.0], [1.0, -1.0], [-1.0, 1.0], [-1.0, -1.0]]
)


def support_polygons(
    schedule: ContactScheduleArrays,
    half_length: float = 0.07,
    half_width: float = 0.04,
    max_halfspaces: int = 8,
):
    """Per-knot ZMP support polygons as padded half-spaces.

    For each knot, the corner points of every *active* foot (E feet × 4
    corners, with a validity mask) go through the jittable monotone chain →
    padded ``A x ≤ b`` rows (inactive rows are the always-true constraint).
    If NO foot is active at a knot (flight — not produced by
    :func:`footstep_plan`), the previous knot's polygon is reused.

    Returns ``(poly_A (T, F, 2), poly_b (T, F))`` with ``F = max_halfspaces``.
    """
    E, T = schedule.active.shape
    corners = _FOOT_CORNERS * np.array([half_length, half_width])
    # world corner points per (knot, foot, corner)
    foot_xy = np.transpose(schedule.position[:, :, :2], (1, 0, 2))  # (T, E, 2)
    # rotate corners by the foothold yaw (rotation's top-left 2x2)
    rot2 = np.transpose(schedule.rotation[:, :, :2, :2], (1, 0, 2, 3))
    pts = foot_xy[:, :, None, :] + np.einsum(
        "teij,cj->teci", rot2, corners
    )                                                              # (T, E, 4, 2)
    valid = np.repeat(
        np.transpose(schedule.active, (1, 0))[:, :, None], 4, axis=2
    )                                                              # (T, E, 4)
    pts = jnp.asarray(pts.reshape(T, E * 4, 2))
    valid = jnp.asarray(valid.reshape(T, E * 4))

    def hull_knot(p, v):
        poly = monotone_chain_2d(p, v)
        A, b = halfspaces_from_polygon(poly)
        return A, b

    A, b = jax.vmap(hull_knot)(pts, valid)
    F = A.shape[1]
    if F < max_halfspaces:
        pad = max_halfspaces - F
        A = jnp.pad(A, ((0, 0), (0, pad), (0, 0)))
        b = jnp.pad(b, ((0, 0), (0, pad)), constant_values=1.0)
    else:
        A, b = A[:, :max_halfspaces], b[:, :max_halfspaces]

    # flight knots: carry the previous polygon forward (host-side fix-up)
    any_active = np.asarray(schedule.active.any(axis=0))
    A, b = np.asarray(A), np.asarray(b)
    for k in range(1, T):
        if not any_active[k]:
            A[k], b[k] = A[k - 1], b[k - 1]
    return jnp.asarray(A), jnp.asarray(b)


def gait_references(params: LIPMParams, schedule: ContactScheduleArrays, dt):
    """ZMP reference = centroid of the active feet per knot; DCM reference by
    the backward recursion ending on the final stance centroid."""
    active = schedule.active.astype(np.float64)            # (E, T)
    weights = active / np.maximum(active.sum(axis=0, keepdims=True), 1.0)
    zmp_ref = np.einsum("et,eta->ta", weights, schedule.position[:, :, :2])
    # knots with no active foot: hold previous
    any_active = schedule.active.any(axis=0)
    for k in range(1, len(any_active)):
        if not any_active[k]:
            zmp_ref[k] = zmp_ref[k - 1]
    zmp_ref = jnp.asarray(zmp_ref)
    dcm_ref = dcm_backward_recursion(params, zmp_ref, zmp_ref[-1], dt)
    return zmp_ref, dcm_ref


def plan_gait(
    params: LIPMParams,
    lists: dict,
    dt: float,
    dcm0,
    com0,
    *,
    half_length: float = 0.07,
    half_width: float = 0.04,
    weights: Optional[DCMWeights] = None,
    iterations: int = 1000,
    horizon: Optional[int] = None,
    **qp_kwargs,
) -> Tuple[DCMPlan, ContactScheduleArrays]:
    """Full-gait DCM plan (config 3): schedule → hulls → refs → batched QP."""
    total_time = max(lst.last_contact().deactivation_time
                     for lst in lists.values())
    T = horizon if horizon is not None else int(round(total_time / dt))
    schedule = lower_contact_schedule(lists, dt=dt, horizon=T)
    poly_A, poly_b = support_polygons(schedule, half_length, half_width)
    zmp_ref, dcm_ref = gait_references(params, schedule, dt)
    dtype = zmp_ref.dtype
    plan = solve_dcm_mpc(
        params, dt, jnp.asarray(dcm0, dtype), jnp.asarray(com0, dtype),
        dcm_ref, zmp_ref, poly_A.astype(dtype), poly_b.astype(dtype),
        weights, iterations=iterations, **qp_kwargs,
    )
    return plan, schedule
