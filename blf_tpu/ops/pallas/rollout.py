"""Fused rigid-foot contact rollout — Pallas TPU kernel.

The reference's hot simulation loop (``FixedStepIntegrator.tpp:48-61`` over
contact-closed floating-base dynamics, SURVEY.md §3.1) for the rigid-foot
case, executed entirely in VMEM: a lane block's state stays on-chip for ALL
``steps`` Euler steps, so HBM sees each lane exactly twice (load + store)
instead of twice *per step* as in the ``lax.scan`` XLA path. The math is
identical to :func:`blf_tpu.models.foot.foot_dynamics` (closed-form patch
wrench ``ContinuousContactModel.cpp:79-108``, Newton–Euler with diagonal
body inertia, Baumgarte SO(3) stabilisation ``FloatingBaseSystemKinematics
.cpp:64-68``).

Layout: **struct-of-tiles, lane-minor** — every scalar field is an
``(8, B/8)`` tile (positions 3 tiles, rotations 9, …), so each VPU op fills
the full 8-sublane × 128-lane vector unit. The lane-major ``(B, C)`` layout
would waste ≈ 100 − C/128 % of every op on the lane axis, and the earlier
``(1, B)`` row layout wasted 7/8 of the sublane axis (measured 0.24 T op/s
→ the tile layout's win is the VPU's full sublane width). All compute is
elementwise/cross-product VPU work (no MXU): per-lane 3×3 algebra is
unrolled componentwise, and the symmetric 3×3 inverse in the Baumgarte term
is a closed-form adjugate.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["foot_rollout_fused"]

GRAVITY_Z = -9.81
SUB_PAD = 8


def _pad_coeff(c, B, Bp):
    """Pad a per-lane (B,) contact coefficient to Bp lanes; scalars pass."""
    a = jnp.asarray(c)
    if a.ndim == 0 or a.reshape(-1).shape[0] == 1:
        return c
    a = a.reshape(-1)
    return jnp.concatenate([a, jnp.broadcast_to(a[:1], (Bp - B,))])


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _mat_vec(r, v):
    """r: 9-tuple, row-major R[i][j] = r[3i+j]; v: 3-tuple."""
    return tuple(r[3 * i] * v[0] + r[3 * i + 1] * v[1] + r[3 * i + 2] * v[2]
                 for i in range(3))


def _mat_t_vec(r, v):
    return tuple(r[j] * v[0] + r[3 + j] * v[1] + r[6 + j] * v[2]
                 for j in range(3))


def _rollout_kernel(
    p_ref, r_ref, v_ref, w_ref, p0_ref, r0_ref, kb_ref, scal_ref,
    p_out, r_out, v_out, w_out,
    *, steps: int, chunks: int, step_unroll: int = 1,
):
    SUB = 8  # sublane tile height: each field is rows of (SUB, BB/SUB)
    L = scal_ref[0, 0]
    Wd = scal_ref[1, 0]
    mass = scal_ref[2, 0]
    I1, I2, I3 = scal_ref[3, 0], scal_ref[4, 0], scal_ref[5, 0]
    rho = scal_ref[6, 0]
    dt = scal_ref[7, 0]

    # `chunks` independent column sub-tiles: the per-step op chain is fully
    # serial (each Euler step depends on the last), so a single chunk runs
    # at VPU *latency*, not throughput; interleaving independent chunks
    # gives the scheduler ILP to hide it.
    cw = p_ref.shape[1] // chunks
    row = lambda ref, i, c: ref[SUB * i:SUB * (i + 1), c * cw:(c + 1) * cw]
    p0 = [tuple(row(p0_ref, i, c) for i in range(3)) for c in range(chunks)]
    r0 = [tuple(row(r0_ref, i, c) for i in range(9)) for c in range(chunks)]
    k = [row(kb_ref, 0, c) for c in range(chunks)]
    b = [row(kb_ref, 1, c) for c in range(chunks)]
    area = L * Wd
    L2, W2 = L * L, Wd * Wd
    r0e1 = [(r0[c][0], r0[c][3], r0[c][6]) for c in range(chunks)]
    r0e2 = [(r0[c][1], r0[c][4], r0[c][7]) for c in range(chunks)]

    def one_chunk(c, p, r, v, w):
        p0c, k_c, b_c = p0[c], k[c], b[c]
        r0e1c, r0e2c = r0e1[c], r0e2[c]
        # -- closed-form patch wrench (ContinuousContactModel.cpp:79-108) --
        ar33 = jnp.abs(r[8])
        fscale = ar33 * area
        f = tuple(fscale * (k_c * (p0c[i] - p[i]) - b_c * v[i])
                  for i in range(3))
        re1 = (r[0], r[3], r[6])
        re2 = (r[1], r[4], r[7])
        e1w = _cross(re1, _cross(re1, w))
        e2w = _cross(re2, _cross(re2, w))
        e1r0 = _cross(re1, r0e1c)
        e2r0 = _cross(re2, r0e2c)
        tscale = ar33 * (area / 12.0)
        tau = tuple(
            tscale * (L2 * (b_c * e1w[i] + k_c * e1r0[i])
                      + W2 * (b_c * e2w[i] + k_c * e2r0[i]))
            for i in range(3)
        )

        # -- Newton–Euler with diagonal body inertia ------------------------
        v_dot = (f[0] / mass, f[1] / mass, f[2] / mass + GRAVITY_Z)
        u = _mat_t_vec(r, w)                       # Rᵀω
        iww = _mat_vec(r, (I1 * u[0], I2 * u[1], I3 * u[2]))
        gyro = _cross(w, iww)
        te = tuple(tau[i] - gyro[i] for i in range(3))
        ut = _mat_t_vec(r, te)
        w_dot = _mat_vec(r, (ut[0] / I1, ut[1] / I2, ut[2] / I3))

        # -- Ṙ = ω̂R + ρ/2 (S⁻¹ − I) R, S = RRᵀ (adjugate inverse) ----------
        # S symmetric: s_ik = Σ_j r[i][j] r[k][j]
        s00 = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]
        s01 = r[0] * r[3] + r[1] * r[4] + r[2] * r[5]
        s02 = r[0] * r[6] + r[1] * r[7] + r[2] * r[8]
        s11 = r[3] * r[3] + r[4] * r[4] + r[5] * r[5]
        s12 = r[3] * r[6] + r[4] * r[7] + r[5] * r[8]
        s22 = r[6] * r[6] + r[7] * r[7] + r[8] * r[8]
        c00 = s11 * s22 - s12 * s12
        c01 = s02 * s12 - s01 * s22
        c02 = s01 * s12 - s02 * s11
        c11 = s00 * s22 - s02 * s02
        c12 = s01 * s02 - s00 * s12
        c22 = s00 * s11 - s01 * s01
        det = s00 * c00 + s01 * c01 + s02 * c02
        inv = 1.0 / det
        m_rows = ((c00 * inv - 1.0, c01 * inv, c02 * inv),
                  (c01 * inv, c11 * inv - 1.0, c12 * inv),
                  (c02 * inv, c12 * inv, c22 * inv - 1.0))
        half_rho = 0.5 * rho
        r_dot = []
        for i in range(3):
            for j in range(3):
                col = (r[j], r[3 + j], r[6 + j])
                wxr = (w[(i + 1) % 3] * col[(i + 2) % 3]
                       - w[(i + 2) % 3] * col[(i + 1) % 3])
                corr = (m_rows[i][0] * r[j] + m_rows[i][1] * r[3 + j]
                        + m_rows[i][2] * r[6 + j])
                r_dot.append(wxr + half_rho * corr)

        # -- forward Euler (ForwardEuler.tpp:19-41: x += dT·f) ---------------
        p_n = tuple(p[i] + dt * v[i] for i in range(3))
        v_n = tuple(v[i] + dt * v_dot[i] for i in range(3))
        w_n = tuple(w[i] + dt * w_dot[i] for i in range(3))
        r_n = tuple(r[i] + dt * r_dot[i] for i in range(9))
        return p_n, r_n, v_n, w_n

    def body(_, carry):
        # `step_unroll` dependent steps as straight-line code per loop trip:
        # the falsification experiment for the VMEM-round-trip hypothesis
        # (SOL.md "Foot rollout") — if carries spill to VMEM each step, a
        # k-step register-blocked body cuts that traffic ~k× and throughput
        # should rise; if throughput is invariant, the bound is elsewhere.
        out = carry
        for _ in range(step_unroll):
            out = tuple(one_chunk(c, *out[c]) for c in range(chunks))
        return out

    init = tuple(
        (tuple(row(p_ref, i, c) for i in range(3)),
         tuple(row(r_ref, i, c) for i in range(9)),
         tuple(row(v_ref, i, c) for i in range(3)),
         tuple(row(w_ref, i, c) for i in range(3)))
        for c in range(chunks)
    )
    final = jax.lax.fori_loop(0, steps // step_unroll, body, init)
    for _ in range(steps % step_unroll):
        final = tuple(one_chunk(c, *final[c]) for c in range(chunks))
    for c in range(chunks):
        p, r, v, w = final[c]
        cs = slice(c * cw, (c + 1) * cw)
        for i in range(3):
            p_out[SUB * i:SUB * (i + 1), cs] = p[i]
            v_out[SUB * i:SUB * (i + 1), cs] = v[i]
            w_out[SUB * i:SUB * (i + 1), cs] = w[i]
        for i in range(9):
            r_out[SUB * i:SUB * (i + 1), cs] = r[i]


def foot_rollout_fused(
    cparams,              # blf_tpu.models.contact.ContactParams (scalars)
    fparams,              # blf_tpu.models.foot.FootParams
    state,                # blf_tpu.models.foot.FootState, leaves (B, …)
    null_position,        # (B, 3) or (3,)
    null_rotation,        # (B, 3, 3) or (3, 3)
    *,
    dt,
    steps: int,
    block_lanes: int = 2048,
    chunks: int = 4,
    step_unroll: int = 1,
    interpret=None,
):
    """Run the fused rollout; returns the final FootState (same shapes).
    ``block_lanes`` must give ≥128 columns per 8-sublane tile (i.e. ≥1024)
    to fill the VPU lane width; 2048 measured best on v5e.

    Scalar contact/foot parameters may be traced; ``spring_coeff`` /
    ``damper_coeff`` may additionally be per-lane ``(B,)`` (identification
    sweeps). ``steps`` must be a static int.
    """
    from blf_tpu.models.foot import FootState

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = state.position.shape[0]
    # sublane tiling needs B % 8 == 0: pad odd batches by replicating lane 0
    # (lanes are independent; the tail is discarded) — ADVICE r3 low #2
    if B % SUB_PAD:
        Bp = -(-B // SUB_PAD) * SUB_PAD
        pad = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (Bp - B,) + a.shape[1:])], axis=0)
        out = foot_rollout_fused(
            cparams._replace(
                spring_coeff=_pad_coeff(cparams.spring_coeff, B, Bp),
                damper_coeff=_pad_coeff(cparams.damper_coeff, B, Bp)),
            fparams,
            jax.tree_util.tree_map(pad, state),
            pad(jnp.broadcast_to(null_position, (B, 3))),
            pad(jnp.broadcast_to(null_rotation, (B, 3, 3))),
            dt=dt, steps=steps, block_lanes=block_lanes, chunks=chunks,
            step_unroll=step_unroll, interpret=interpret,
        )
        return jax.tree_util.tree_map(lambda a: a[:B], out)
    dtype = state.position.dtype
    SUB = 8
    # Mosaic requires the block's lane dim to be a multiple of 128 (or the
    # full array): with 8-sublane tiles that means block_lanes % 1024 == 0
    # unless the block covers the whole batch.
    block_lanes = min(block_lanes, B)
    if block_lanes < B:
        block_lanes = max(1024, (block_lanes // 1024) * 1024)
        while B % block_lanes:
            block_lanes -= 1024
        if block_lanes < 1024:
            block_lanes = B
    if B % block_lanes or block_lanes % SUB:
        raise ValueError(f"batch {B} not tileable at block_lanes {block_lanes}")

    # (B,) lanes → (8, B/8) sublane tiles, stacked per component:
    # component i of a C-vector field lives at rows [8i, 8i+8)
    t = lambda a, C: jnp.swapaxes(a, 0, 1).reshape(C * SUB, B // SUB)
    p_t = t(state.position, 3)                               # (24, B/8)
    r_t = t(state.rotation.reshape(B, 9), 9)                 # (72, B/8)
    v_t = t(state.linear_velocity, 3)
    w_t = t(state.angular_velocity, 3)
    p0_t = t(jnp.broadcast_to(null_position, (B, 3)), 3)
    r0_t = t(jnp.broadcast_to(null_rotation, (B, 3, 3)).reshape(B, 9), 9)
    def _lane_coeff(c):
        a = jnp.asarray(c, dtype)
        a = a.reshape(-1) if a.ndim else a       # accept (), (B,), (B, 1)
        return jnp.broadcast_to(a, (B,))

    kb = jnp.stack([_lane_coeff(cparams.spring_coeff),
                    _lane_coeff(cparams.damper_coeff)]).reshape(
        2 * SUB, B // SUB)                                   # (16, B/8)
    scal = jnp.stack([
        jnp.asarray(cparams.length, dtype).reshape(()),
        jnp.asarray(cparams.width, dtype).reshape(()),
        jnp.asarray(fparams.mass, dtype).reshape(()),
        jnp.asarray(fparams.inertia, dtype)[0],
        jnp.asarray(fparams.inertia, dtype)[1],
        jnp.asarray(fparams.inertia, dtype)[2],
        jnp.asarray(fparams.baumgarte_rho, dtype).reshape(()),
        jnp.asarray(dt, dtype).reshape(()),
    ]).reshape(8, 1)

    cols = block_lanes // SUB
    lane = lambda rows: pl.BlockSpec((rows * SUB, cols), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    grid = (B // block_lanes,)
    cols = block_lanes // SUB
    chunks = max(1, min(chunks, cols // 128))
    while cols % (chunks * 128) and chunks > 1:
        chunks -= 1
    kernel = functools.partial(_rollout_kernel, steps=int(steps),
                               chunks=chunks,
                               step_unroll=max(1, int(step_unroll)))
    p_o, r_o, v_o, w_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane(3), lane(9), lane(3), lane(3), lane(3), lane(9), lane(2),
            pl.BlockSpec((8, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[lane(3), lane(9), lane(3), lane(3)],
        out_shape=[
            jax.ShapeDtypeStruct((3 * SUB, B // SUB), dtype),
            jax.ShapeDtypeStruct((9 * SUB, B // SUB), dtype),
            jax.ShapeDtypeStruct((3 * SUB, B // SUB), dtype),
            jax.ShapeDtypeStruct((3 * SUB, B // SUB), dtype),
        ],
        interpret=interpret,
    )(p_t, r_t, v_t, w_t, p0_t, r0_t, kb, scal)

    ut = lambda a, C: jnp.swapaxes(a.reshape(C, B), 0, 1)
    return FootState(
        position=ut(p_o, 3),
        rotation=ut(r_o, 9).reshape(B, 3, 3),
        linear_velocity=ut(v_o, 3),
        angular_velocity=ut(w_o, 3),
    )
