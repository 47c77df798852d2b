"""Fused batched ADMM stage — Pallas TPU kernel (v-space spectral form).

The hot op of the scenario-sweep path (BASELINE "rollout and QP factorization
kernels must hit speed-of-light"): one *stage* of the spectral shared-matrix
ADMM of :func:`blf_tpu.mpc.qp.solve_qp_factored` — ``iters`` iterations at
fixed per-lane penalty multiplier ``s`` — executed entirely in VMEM. The XLA
version pays this machine's per-op dispatch floor (~10-30 µs/op measured at
these tensor sizes) and streams the iterates through HBM every stage; here a
lane block stays resident across all iterations, so HBM sees each lane
exactly twice (load + store) and the whole stage is ONE device op.

**v-space formulation.** With the σ·x proximal term dropped from the x-step
rhs (exact for ``sigma=0``; for the tiny default σ the fixed point shifts by
``σ·‖x‖ ≈ 1e-7`` — see ``factor_shared_qp``), the primal iterate never feeds
back into the recursion and the whole OSQP iteration collapses onto the
*pre-clip constraint-space point* ``v = z_relaxed + y/ρ`` (so
``z = clip(v, l, u)`` and ``y = ρ(v − z)`` are recoverable views, not state):

    z  = clip(v, l, u)
    w  = ρ ⊙ (2z − v)                       ( = ρz − y )
    t  = w·G₂ − (q·W)                       ( = rhs·W, G₂ = A·W )
    τ  = t / (1 + s·d)                      ( x̃ = τ·Wᵀ, exact K(s)⁻¹ )
    v += α (τ·G₂ᵀ − z)                      ( relaxed z/y update, fused )

Two GEMMs per iteration, contraction dims m and n — versus four in the
(x, z, y) form (which needs two extra (n, n) spectral-basis products per
iteration). Identical math to the XLA path of ``solve_qp_factored``
(bit-close in interpret mode).

``matmul="split"`` runs both products as 3 bf16 MXU passes on a hi/lo
split-f32 pair (~2× the MXU rate of 6-pass ``Precision.HIGHEST``, rel. err
≲ 2⁻¹⁷). It is the loose-tolerance throughput mode relative to the refined
XLA path, but its measured floor is ~1e-6 relative residuals on the
warm-started fleet — fine at the default eps of 1e-5. ``"f32"`` keeps the
full 6-pass HIGHEST products (bit-compatible with the XLA path). Reference:
the reference snapshot has no QP solver at all (SURVEY.md §7 new
components); this kernel is pure TPU engineering.

Per-block VMEM at ``block_lanes=1024`` (n, m ≤ 128): iterates + bounds
~1.8 MB + shared operators ~0.2 MB — comfortably under 16 MB with revolving
buffers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["admm_stage"]


def _dot_f32(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _split(v):
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_split(a, b_pair):
    """3-pass split-f32 product of f32 ``a`` against a pre-split ``b``."""
    b_hi, b_lo = b_pair
    a_hi, a_lo = _split(a)
    # precision must be DEFAULT: bf16×bf16 with an inherited fp32 contract
    # precision (from the solver's default_matmul_precision context) is
    # rejected by Mosaic ("Bad lhs type") — bf16 inputs ARE the precision.
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _stage_kernel(
    v_ref, tau_ref, s_ref, gq_ref, l_ref, u_ref,
    g2_ref, g2t_ref, d_ref, rho_ref,
    v_out, tau_out,
    *, iters: int, alpha: float, split: bool,
):
    v = v_ref[:]
    tau = tau_ref[:]
    s = s_ref[:]                    # (BB, 1) per-lane penalty multiplier
    gq = gq_ref[:]                  # (BB, n) q·W, constant across iterations
    l = l_ref[:]
    u = u_ref[:]
    d = d_ref[:]                    # (1, n) pencil eigenvalues
    rho = s * rho_ref[:]            # (BB, m) = s · ρ_base
    dinv = 1.0 / (1.0 + s * d)      # (BB, n) spectral gains — fixed per stage

    if split:
        G2_pair = _split(g2_ref[:])
        G2t_pair = _split(g2t_ref[:])
        dot_g2 = lambda a: _dot_split(a, G2_pair)
        dot_g2t = lambda a: _dot_split(a, G2t_pair)
    else:
        G2 = g2_ref[:]              # (m, n) = A·W
        G2t = g2t_ref[:]            # (n, m)
        dot_g2 = lambda a: _dot_f32(a, G2)
        dot_g2t = lambda a: _dot_f32(a, G2t)

    def _match_vma(x, like):
        # under shard_map vma typing the ref reads carry varying-axis types
        # but in-kernel ops drop them; re-assert so the fori_loop carry
        # type-checks (no-op outside shard_map)
        want = getattr(jax.typeof(like), "vma", frozenset())
        have = getattr(jax.typeof(x), "vma", frozenset())
        missing = tuple(ax for ax in want if ax not in have)
        return jax.lax.pvary(x, missing) if missing else x

    def body(_, carry):
        v, tau = carry
        z = jnp.clip(v, l, u)
        w = rho * (2.0 * z - v)
        t = dot_g2(w) - gq
        tau_next = t * dinv
        v_next = v + alpha * (dot_g2t(tau_next) - z)
        return _match_vma(v_next, v), _match_vma(tau_next, tau)

    v, tau = jax.lax.fori_loop(0, iters, body, (v, tau))
    v_out[:] = v
    tau_out[:] = tau


def admm_stage(
    v: jnp.ndarray,        # (B, m) pre-clip constraint-space iterate
    tau: jnp.ndarray,      # (B, n) spectral primal (x̃ = τ·Wᵀ); init 0 is fine
    s: jnp.ndarray,        # (B, 1) per-lane penalty multiplier
    gq: jnp.ndarray,       # (B, n) per-lane q·W (constant over the stage)
    l: jnp.ndarray,        # (B, m)
    u: jnp.ndarray,        # (B, m)
    G2: jnp.ndarray,       # (m, n) shared A·W (scaled frame)
    d: jnp.ndarray,        # (n,) pencil eigenvalues
    base_rho: jnp.ndarray,  # (m,) structural ρ vector
    *,
    iters: int,
    alpha: float,
    matmul: str = "split",
    block_lanes: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``iters`` fused v-space ADMM iterations; returns (v, τ).

    ``B`` must be a multiple of ``block_lanes`` (the sweep path pads batch
    sizes to powers of two anyway; ``block_lanes`` drops to ``B`` when the
    batch is smaller). ±inf bounds are supported. ``interpret`` defaults to
    True off-TPU (CPU tests) and False on TPU. The kernel is the
    loose-tolerance throughput path (no iterative refinement of the spectral
    x-solve — residuals floor ~1e-6 relative; cold ill-conditioned lanes that
    need refinement should run ``backend="xla"`` with ``refine=True``).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if matmul not in ("split", "f32"):
        raise ValueError(f"unknown matmul mode {matmul!r}")
    B, m = v.shape
    n = tau.shape[-1]
    block_lanes = min(block_lanes, B)
    if B % block_lanes:
        raise ValueError(f"batch {B} not divisible by block_lanes {block_lanes}")
    grid = (B // block_lanes,)

    lane = lambda w: pl.BlockSpec((block_lanes, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _stage_kernel, iters=iters, alpha=float(alpha),
        split=(matmul == "split"),
    )
    # clip() with ±inf operands is fine on the VPU; transposes precomputed.
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane(m), lane(n), lane(1), lane(n), lane(m), lane(m),
            full(m, n), full(n, m), full(1, n), full(1, m),
        ],
        out_specs=[lane(m), lane(n)],
        # under shard_map's vma typing, outputs inherit the iterates' varying
        # mesh axes (v/τ are batch-sharded; the shared operators are not)
        out_shape=[
            jax.ShapeDtypeStruct((B, m), v.dtype, vma=jax.typeof(v).vma),
            jax.ShapeDtypeStruct((B, n), tau.dtype, vma=jax.typeof(tau).vma),
        ],
        interpret=interpret,
    )(
        v, tau, s, gq, l, u,
        G2, G2.T, d.reshape(1, n), base_rho.reshape(1, m),
    )
