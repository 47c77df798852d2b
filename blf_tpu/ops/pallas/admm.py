"""Fused batched ADMM stage — Pallas TPU kernel (spectral per-lane ρ form).

The hot op of the scenario-sweep path (BASELINE "rollout and QP factorization
kernels must hit speed-of-light"): one *stage* of the spectral shared-matrix
ADMM of :func:`blf_tpu.mpc.qp.solve_qp_factored` — ``iters`` iterations at
fixed per-lane penalty multiplier ``s`` — executed entirely in VMEM. The XLA
version streams ``x/z/y/rhs`` through HBM every iteration and pays this
machine's per-op dispatch floor (~10-30 µs/op measured at these tensor
sizes); here a lane block stays resident across all iterations, so HBM sees
each lane exactly twice (load + store) and the whole stage is ONE device op.

Math per iteration (identical to the XLA path, bit-close in interpret mode):

    ρ    = s · ρ_base                        (per-lane scalar × structural)
    rhs  = σx − q + (ρz − y) A
    x̃   = W ((Wᵀ' rhs) / (1 + s·d)) — exact K(s)⁻¹ for every lane's s via
                                      the pencil eigenbasis (qp.py docs)
    x    = αx̃ + (1−α)x
    zr   = α x̃ Aᵀ + (1−α) z
    z    = clip(zr + y/ρ, l, u)
    y    = y + ρ (zr − z)

``matmul="split"`` runs every product as 3 bf16 MXU passes on a hi/lo
split-f32 pair (~2× the MXU rate of 6-pass ``Precision.HIGHEST``, rel. err
≲ 2⁻¹⁷). It is the loose-tolerance throughput mode relative to the refined
XLA path, but its measured floor is ~1e-6 relative residuals on the
warm-started fleet (bench: max primal residual 6.9e-7 at 50 iterations) —
fine at the default eps of 1e-5. ``"f32"`` keeps the full 6-pass HIGHEST
products (bit-compatible with the XLA path). Reference: the reference snapshot has no QP solver at all
(SURVEY.md §7 new components); this kernel is pure TPU engineering.

Measured on the tunnel-attached v5e (B=16k, n=64, m=96, 50 iters, chained):
XLA 5.8 ms, kernel-f32 7.1 ms, kernel-split 5.7 ms — XLA's scheduler
currently wins at these shapes, so the solver defaults to ``backend="xla"``
and this kernel stays as the optional substrate for pod-scale shapes where
the one-op-per-stage dispatch profile pays off.

Per-block VMEM at ``block_lanes=1024`` (n, m ≤ 128): iterates ~2.5 MB +
shared operators ~0.2 MB — comfortably under 16 MB.
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
    x_ref, z_ref, y_ref, s_ref, q_ref, l_ref, u_ref,
    a_ref, at_ref, w_ref, wt_ref, d_ref, rho_ref, sigma_ref,
    x_out, z_out, y_out,
    *, iters: int, alpha: float, split: bool,
):
    sigma = sigma_ref[0, 0]
    x = x_ref[:]
    z = z_ref[:]
    y = y_ref[:]
    s = s_ref[:]                    # (BB, 1) per-lane penalty multiplier
    q = q_ref[:]                    # (BB, n) per-lane linear term
    l = l_ref[:]
    u = u_ref[:]
    d = d_ref[:]                    # (1, n) pencil eigenvalues
    rho = s * rho_ref[:]            # (BB, m) = s · ρ_base
    dinv = 1.0 / (1.0 + s * d)      # (BB, n) spectral gains — fixed per stage

    if split:
        A_pair = _split(a_ref[:])
        At_pair = _split(at_ref[:])
        W_pair = _split(w_ref[:])
        Wt_pair = _split(wt_ref[:])
        dot_a = lambda v: _dot_split(v, A_pair)
        dot_at = lambda v: _dot_split(v, At_pair)
        dot_w = lambda v: _dot_split(v, W_pair)
        dot_wt = lambda v: _dot_split(v, Wt_pair)
    else:
        A = a_ref[:]                # (m, n)
        At = at_ref[:]              # (n, m)
        W = w_ref[:]                # (n, n)
        Wt = wt_ref[:]              # (n, n)
        dot_a = lambda v: _dot_f32(v, A)
        dot_at = lambda v: _dot_f32(v, At)
        dot_w = lambda v: _dot_f32(v, W)
        dot_wt = lambda v: _dot_f32(v, Wt)

    def _match_vma(v, like):
        # under shard_map vma typing the ref reads carry varying-axis types
        # but in-kernel ops drop them; re-assert so the fori_loop carry
        # type-checks (no-op outside shard_map)
        want = getattr(jax.typeof(like), "vma", frozenset())
        have = getattr(jax.typeof(v), "vma", frozenset())
        missing = tuple(ax for ax in want if ax not in have)
        return jax.lax.pvary(v, missing) if missing else v

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q + dot_a(rho * z - y)
        x_tilde = dot_wt(dot_w(rhs) * dinv)
        x_next = alpha * x_tilde + (1.0 - alpha) * x
        z_relaxed = alpha * dot_at(x_tilde) + (1.0 - alpha) * z
        z_next = jnp.clip(z_relaxed + y / rho, l, u)
        y_next = y + rho * (z_relaxed - z_next)
        return _match_vma(x_next, x), _match_vma(z_next, z), _match_vma(y_next, y)

    x, z, y = jax.lax.fori_loop(0, iters, body, (x, z, y))
    x_out[:] = x
    z_out[:] = z
    y_out[:] = y


def admm_stage(
    x: jnp.ndarray,        # (B, n)
    z: jnp.ndarray,        # (B, m)
    y: jnp.ndarray,        # (B, m)
    s: jnp.ndarray,        # (B, 1) per-lane penalty multiplier
    q: jnp.ndarray,        # (B, n) per-lane linear term
    l: jnp.ndarray,        # (B, m)
    u: jnp.ndarray,        # (B, m)
    A: jnp.ndarray,        # (m, n) shared constraints (scaled frame)
    W: jnp.ndarray,        # (n, n) spectral basis (K(s)⁻¹ = W/(1+s·d)·Wᵀ)
    d: jnp.ndarray,        # (n,) pencil eigenvalues
    base_rho: jnp.ndarray,  # (m,) structural ρ vector
    *,
    iters: int,
    sigma,                 # scalar (python float or traced 0-d array)
    alpha: float,
    refine: bool = False,
    matmul: str = "split",
    block_lanes: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run ``iters`` fused spectral-ADMM iterations; returns (x, z, y).

    ``B`` must be a multiple of ``block_lanes`` (the sweep path pads batch
    sizes to powers of two anyway; ``block_lanes`` drops to ``B`` when the
    batch is smaller). ±inf bounds are supported. ``interpret`` defaults to
    True off-TPU (CPU tests) and False on TPU. ``refine`` is accepted for
    signature parity and ignored: the kernel is the loose-tolerance
    throughput path (no iterative refinement of the spectral x-solve —
    residuals floor ~1e-6 relative; cold ill-conditioned lanes that need
    refinement should run ``backend="xla"``).
    """
    del refine
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if matmul not in ("split", "f32"):
        raise ValueError(f"unknown matmul mode {matmul!r}")
    B, n = x.shape
    m = z.shape[-1]
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
            lane(n), lane(m), lane(m), lane(1), lane(n), lane(m), lane(m),
            full(m, n), full(n, m), full(n, n), full(n, n),
            full(1, n), full(1, m), full(1, 1),
        ],
        out_specs=[lane(n), lane(m), lane(m)],
        # under shard_map's vma typing, outputs inherit the iterates' varying
        # mesh axes (x/z/y are batch-sharded; the shared operators are not)
        out_shape=[
            jax.ShapeDtypeStruct((B, n), x.dtype, vma=jax.typeof(x).vma),
            jax.ShapeDtypeStruct((B, m), z.dtype, vma=jax.typeof(z).vma),
            jax.ShapeDtypeStruct((B, m), y.dtype, vma=jax.typeof(y).vma),
        ],
        interpret=interpret,
    )(
        x, z, y, s, q, l, u,
        A, A.T, W, W.T, d.reshape(1, n), base_rho.reshape(1, m),
        jnp.asarray(sigma, x.dtype).reshape(1, 1),
    )
