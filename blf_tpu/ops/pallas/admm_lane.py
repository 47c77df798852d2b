"""Fused per-lane ADMM stage — Pallas TPU kernel (heterogeneous operators).

The shared-matrix kernel (:mod:`blf_tpu.ops.pallas.admm`) requires every
lane to share one (P, A): right for scenario fleets of one transcription,
impossible for the whole-body QP of the control stack (BASELINE config 4),
where P and A carry each lane's OWN mass matrix and contact Jacobians
(reference dynamics ``FloatingBaseSystemDynamics.cpp:102-251`` — one robot
state per lane). The XLA path for that shape is a chain of batched tiny
matvecs + batched Cholesky refactorizations: judge-profiled at ~326 ms of
the 549 ms config-4 fleet tick (B=256).

This kernel runs the v-space ADMM recursion with **per-lane operators
resident in VMEM** across all iterations of a stage:

    z  = clip(v, l, u)
    w  = ρ ⊙ (2z − v)                      ( = ρz − y )
    x̃  = K⁻¹ (Aᵀw − q)                     (K = P + σI + AᵀρA, prefactored)
    v += α (A x̃ − z)

Layout: batch-minor everywhere — every vector is ``(rows, B)`` with the
lane block in the 128-wide minor dimension, and the per-lane matrices are
``(rows, cols, B)`` stacks whose leading index is unrolled: each step is a
full-width (cols, B) VPU op across the whole lane block (row read →
broadcast-FMA for the expansion product, multiply + sublane-reduce for the
contractions). No MXU: with one distinct matrix per lane there is no
shared GEMM to tile and the arithmetic intensity is 1 — the kernel is
VMEM-bandwidth-bound (A twice + K⁻¹ once ≈ 7.7 MB/iteration/block), which
is exactly the regime where keeping the operators on-chip across the whole
stage wins: the XLA path re-streams them from HBM every iteration and pays
per-op dispatch on every matvec.

Accuracy: pure f32 VPU arithmetic — no bf16 MXU passes at all, so unlike
the shared kernel there is no split-precision contract; the fixed point
matches the XLA v-space recursion to f32 rounding.

The consuming solver (``blf_tpu.mpc.qp.solve_qp`` with
``backend="pallas"``) factors K once per stage through
:func:`blf_tpu.ops.pallas.linalg.cholesky_inverse_lane` and runs
stage-boundary ρ adaptation / diagnostics in XLA, mirroring
``solve_qp_factored``'s structure.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["admm_lane_stage"]


def _lane_kernel(v_ref, rho_ref, A_ref, Kinv_ref, q_ref, l_ref, u_ref,
                 v_out, x_out, acc_ref, av_ref,
                 *, iters: int, alpha: float, m: int, n: int):
    """One ADMM stage for a lane block; A_ref (m, n, B), Kinv_ref (n, n, B)."""

    def body(_, v):
        z = jnp.clip(v, l_ref[:], u_ref[:])                  # (m, B)
        w = rho_ref[:] * (2.0 * z - v)                       # (m, B)
        # rhs = Aᵀw − q: expansion — m broadcast-FMA steps of (n, B)
        acc_ref[:] = -q_ref[:]
        for j in range(m):
            acc_ref[:] += A_ref[j] * w[j:j + 1, :]
        rhs = acc_ref[:]                                     # (n, B)
        # x̃ = K⁻¹ rhs: n multiply + sublane-reduce steps
        for i in range(n):
            x_out[i:i + 1, :] = jnp.sum(Kinv_ref[i] * rhs, axis=0,
                                        keepdims=True)
        xt = x_out[:]                                        # (n, B)
        # A x̃: m multiply + sublane-reduce steps
        for j in range(m):
            av_ref[j:j + 1, :] = jnp.sum(A_ref[j] * xt, axis=0,
                                         keepdims=True)
        return v + alpha * (av_ref[:] - z)

    v_out[:] = jax.lax.fori_loop(0, iters, body, v_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("iters", "alpha", "block_lanes", "interpret"))
def admm_lane_stage(
    v: jnp.ndarray,         # (m, B) pre-clip constraint-space iterate
    rho: jnp.ndarray,       # (m, B) per-lane penalty vector (s ⊙ base_rho)
    A: jnp.ndarray,         # (m, n, B) per-lane constraints (scaled frame)
    Kinv: jnp.ndarray,      # (n, n, B) per-lane KKT inverse at this ρ
    q: jnp.ndarray,         # (n, B) per-lane linear cost (scaled frame)
    l: jnp.ndarray,         # (m, B)
    u: jnp.ndarray,         # (m, B)
    *,
    iters: int,
    alpha: float = 1.6,
    block_lanes: int = 128,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``iters`` fused per-lane v-space ADMM iterations; returns (v, x̃).

    ``B`` is padded to a lane block internally (padded lanes iterate on a
    trivial identity problem). ±inf bounds are fine. ``interpret`` defaults
    to True off-TPU. The returned x̃ is the last iteration's primal in the
    scaled frame (z, y are recoverable views: ``z = clip(v, l, u)``,
    ``y = ρ(v − z)``).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, B = v.shape
    n = q.shape[0]
    block = min(block_lanes, B) if interpret else block_lanes
    pad = (-B) % block
    if pad:
        padv = lambda a: jnp.pad(a, ((0, 0), (0, pad)))
        v, q, l, u = padv(v), padv(q), padv(l), padv(u)
        rho = jnp.pad(rho, ((0, 0), (0, pad)), constant_values=1.0)
        A = jnp.pad(A, ((0, 0), (0, 0), (0, pad)))
        # identity K⁻¹ on padded lanes keeps the iteration finite
        Kinv = jnp.pad(Kinv, ((0, 0), (0, 0), (0, pad)))
        lane_pad = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, B + pad), 2) >= B
        Kinv = jnp.where(lane_pad,
                         jnp.eye(n, dtype=v.dtype)[:, :, None], Kinv)
    Bp = B + pad

    mat = lambda r, c: pl.BlockSpec((r, c, block), lambda i: (0, 0, i),
                                    memory_space=pltpu.VMEM)
    vec = lambda r: pl.BlockSpec((r, block), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _lane_kernel, iters=iters, alpha=float(alpha), m=m, n=n)
    v_out, x_out = pl.pallas_call(
        kernel,
        grid=(Bp // block,),
        in_specs=[vec(m), vec(m), mat(m, n), mat(n, n), vec(n), vec(m),
                  vec(m)],
        out_specs=[vec(m), vec(n)],
        out_shape=[jax.ShapeDtypeStruct((m, Bp), v.dtype),
                   jax.ShapeDtypeStruct((n, Bp), v.dtype)],
        input_output_aliases={0: 0},
        scratch_shapes=[pltpu.VMEM((n, block), v.dtype),
                        pltpu.VMEM((m, block), v.dtype)],
        interpret=interpret,
    )(v, rho, A, Kinv, q, l, u)
    return v_out[:, :B], x_out[:, :B]
