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

**Transposed (batch-minor) layout.** The MXU pads the contraction and
output dimensions of a matmul to 128-lane tiles but the *row* dimension only
to the 8-sublane granule. On an MPC transcription the operator dims (n, m)
sit below 128 (n=64, m=96 at horizon 16), so a lane-major ``(B, m)×(m, n)``
product wastes ``1 − (96·64)/(128·128) = 62.5 %`` of every MXU pass. This
kernel therefore stores every per-lane quantity **transposed** — ``v`` is
``(m, B)``, ``τ`` is ``(n, B)`` — and runs the products operator-on-the-left
(``t = Gᵀ·w``: rows n, contraction m→128-pad, columns B at full width),
cutting the padding waste to the contraction dim only: 60 % of MXU passes
useful at (96, 64) vs 37.5 % lane-major, and 86 % at 128-aligned shapes
(horizon 32). Elementwise VPU work is layout-indifferent; the per-lane
penalty ``s`` becomes a (1, B) row broadcast. ``blf_tpu.mpc.qp`` keeps its
iterates transposed across the whole stage scan so the layout conversion
happens once per *solve*, not per stage.

Matmul modes (per-GEMM MXU passes → accuracy):

- ``"delta"`` (throughput default): **delta-form accumulation**. The
  recursion is rewritten on increments — ``t_k = t_{k-1} + Gᵀρ·Δŵ`` with
  ``Δŵ = ŵ_k − ŵ_{k-1}`` — so the bf16 *input* rounding error is relative
  to ‖Δŵ‖, which contracts to 0 with the iteration. The telescoped operand
  is ``ŵ₁ + Σ bf16(Δŵ_j)``, which carries a bounded accumulation bias
  (≲ 2⁻⁹·‖ŵ₁ − ŵ*‖ summed over the contracting increments on a cold
  start, smaller warm) — NOT exact cancellation; each stage boundary's
  fresh 3-pass first iteration resets the bias, and the solver's 1e-4
  residual contract is what the tests pin. The operator itself is applied
  as a hi/lo bf16 split pair (2 passes, operator error ~2⁻¹⁸); iteration 1
  applies the full ``ŵ`` with a 3-pass input split so the one-time
  ‖ŵ₁‖·2⁻⁹ input kick never enters the history. Per-iteration cost: 2 GEMM
  passes per product.
- ``"split"``: stateless 3-pass split-f32 products (rel. err ≲ 2⁻¹⁷),
  bit-comparable to the refined XLA path's unrefined fixed point.
- ``"f32"``: 6-pass ``Precision.HIGHEST`` products (bit-compatible with the
  XLA path in interpret mode).

Reference: the reference snapshot has no QP solver at all (SURVEY.md §7 new
components); this kernel is pure TPU engineering.

Per-block VMEM at ``block_lanes=1024`` (n, m ≤ 128): iterates + bounds +
delta carries ~4 MB — comfortably under 16 MB with revolving buffers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["admm_stage", "admm_stage_t"]


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


# ---------------------------------------------------------------------------
# Transposed (batch-minor) kernel — the production stage implementation.
# ---------------------------------------------------------------------------

_DOT_BF16 = functools.partial(
    jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.DEFAULT,
)


def _lsplit_dot3(a_pair, b):
    """3-pass split product, operator-on-the-left: split f32 ``b`` too."""
    a_hi, a_lo = a_pair
    b_hi, b_lo = _split(b)
    return _DOT_BF16(a_hi, b_hi) + _DOT_BF16(a_hi, b_lo) + _DOT_BF16(a_lo, b_hi)


def _lsplit_dot2(a_pair, b16):
    """2-pass product of a pre-split operator against a bf16 increment."""
    a_hi, a_lo = a_pair
    return _DOT_BF16(a_hi, b16) + _DOT_BF16(a_lo, b16)


def _stage_kernel_t(
    v_ref, tau_ref, s_ref, gq_ref, l_ref, u_ref,
    gt_ref, g2_ref, d_ref,
    v_out, tau_out,
    *, iters: int, alpha: float, matmul: str, chunks: int, unroll: int,
):
    """Transposed stage: per-lane arrays are (rows, B_block), lanes minor.

    ``gt_ref`` is ``(n, m) = (base_rho ⊙ G₂)ᵀ`` — the structural ρ folded
    into the operator so the m-wide per-element ρ multiply disappears; the
    per-lane scalar ``s`` is hoisted into the spectral gain
    ``sdinv = s / (1 + s·d)`` and the shifted offset ``gqs = gq / s``
    (both computed once per block): τ = (Gᵀρ·ŵ − gq/s) ⊙ s·dinv.

    ``chunks`` splits the block into independent column sub-tiles whose op
    streams interleave (software pipelining: one chunk's VPU tail can
    overlap another chunk's MXU passes); ``unroll`` unrolls that many
    iterations per loop trip, giving the scheduler a long straight-line
    window. Measured on v5e, delta mode, B=98304: the ch=2/un=8 defaults
    reach 14.7% of bf16 peak as useful FLOPs at (m,n)=(96,64) and 28–29%
    at the 128-aligned (192,128) transcription (SOL.md), ~1.5× over the
    plain loop — the kernel is otherwise fully serialized (VPU chain ≈ MXU
    chain ≈ half the stage time each).
    """
    s = s_ref[:]                    # (1, BB)
    d = d_ref[:]                    # (n, 1) pencil eigenvalues
    sdinv_full = s / (1.0 + d * s)  # (n, BB) spectral gain, fixed per stage
    gqs_full = gq_ref[:] / s        # (n, BB)

    if matmul == "f32":
        Gt = gt_ref[:]
        G2 = g2_ref[:]
        dot_gt = lambda w: _dot_f32(Gt, w)
        dot_g2 = lambda t: _dot_f32(G2, t)
    else:
        Gt_pair = _split(gt_ref[:])
        G2_pair = _split(g2_ref[:])
        dot_gt = lambda w: _lsplit_dot3(Gt_pair, w)
        dot_g2 = lambda t: _lsplit_dot3(G2_pair, t)

    BB = v_ref.shape[1]
    cw = BB // chunks
    cols = lambda a, c: a[:, c * cw:(c + 1) * cw]
    C = range(chunks)
    l = [cols(l_ref[:], c) for c in C]
    u = [cols(u_ref[:], c) for c in C]
    gqs = [cols(gqs_full, c) for c in C]
    sdinv = [cols(sdinv_full, c) for c in C]
    v = [cols(v_ref[:], c) for c in C]

    def _match_vma(x, like):
        # under shard_map vma typing the ref reads carry varying-axis types
        # but in-kernel ops drop them; re-assert so the fori_loop carry
        # type-checks (no-op outside shard_map)
        want = getattr(jax.typeof(like), "vma", frozenset())
        have = getattr(jax.typeof(x), "vma", frozenset())
        missing = tuple(ax for ax in want if ax not in have)
        return jax.lax.pvary(x, missing) if missing else x

    if matmul == "delta":
        # Iteration 1 applies the full ŵ/τ through 3-pass input splits (the
        # one-time ‖ŵ₁‖·2⁻⁹ bf16 input kick never enters the history);
        # iterations 2… accumulate 2-pass operator-split products of the
        # bf16-rounded increments, whose rounding error contracts with Δŵ.
        z = [jnp.clip(v[c], l[c], u[c]) for c in C]
        w_hat = [2.0 * z[c] - v[c] for c in C]
        t_acc = [dot_gt(w_hat[c]) for c in C]       # 3-pass (split path)
        tau = [(t_acc[c] - gqs[c]) * sdinv[c] for c in C]
        u_acc = [dot_g2(tau[c]) for c in C]         # 3-pass
        v = [v[c] + alpha * (u_acc[c] - z[c]) for c in C]

        def one_iter(v, w_prev, t_acc, tau_prev, u_acc):
            z = [jnp.clip(v[c], l[c], u[c]) for c in C]
            w_hat = [2.0 * z[c] - v[c] for c in C]
            dw = [(w_hat[c] - w_prev[c]).astype(jnp.bfloat16) for c in C]
            t_acc = [t_acc[c] + _lsplit_dot2(Gt_pair, dw[c]) for c in C]
            tau = [(t_acc[c] - gqs[c]) * sdinv[c] for c in C]
            dtau = [(tau[c] - tau_prev[c]).astype(jnp.bfloat16) for c in C]
            u_acc = [u_acc[c] + _lsplit_dot2(G2_pair, dtau[c]) for c in C]
            v = [v[c] + alpha * (u_acc[c] - z[c]) for c in C]
            return v, w_hat, t_acc, tau, u_acc

        def body(_, carry):
            vv, ww, tt, pp, uu = map(list, carry)
            for _ in range(unroll):
                vv, ww, tt, pp, uu = one_iter(vv, ww, tt, pp, uu)
            return tuple(tuple(_match_vma(x, ref) for x, ref in zip(xs, refs))
                         for xs, refs in zip((vv, ww, tt, pp, uu), carry))

        carry = (tuple(v), tuple(w_hat), tuple(t_acc), tuple(tau),
                 tuple(u_acc))
        rest = iters - 1
        carry = jax.lax.fori_loop(0, rest // unroll, body, carry)
        for _ in range(rest % unroll):
            carry = tuple(map(tuple, one_iter(*map(list, carry))))
        v, _, _, tau, _ = carry
    else:
        tau = [cols(tau_ref[:], c) for c in C]

        def one_iter(v, tau):
            z = [jnp.clip(v[c], l[c], u[c]) for c in C]
            w_hat = [2.0 * z[c] - v[c] for c in C]
            tau = [(dot_gt(w_hat[c]) - gqs[c]) * sdinv[c] for c in C]
            v = [v[c] + alpha * (dot_g2(tau[c]) - z[c]) for c in C]
            return v, tau

        def body(_, carry):
            vv, pp = map(list, carry)
            for _ in range(unroll):
                vv, pp = one_iter(vv, pp)
            return tuple(tuple(_match_vma(x, ref) for x, ref in zip(xs, refs))
                         for xs, refs in zip((vv, pp), carry))

        carry = (tuple(v), tuple(tau))
        carry = jax.lax.fori_loop(0, iters // unroll, body, carry)
        for _ in range(iters % unroll):
            carry = tuple(map(tuple, one_iter(*map(list, carry))))
        v, tau = carry

    for c in C:
        v_out[:, c * cw:(c + 1) * cw] = v[c]
        tau_out[:, c * cw:(c + 1) * cw] = tau[c]


def admm_stage_t(
    v: jnp.ndarray,        # (m, B) pre-clip constraint-space iterate
    tau: jnp.ndarray,      # (n, B) spectral primal (x̃ = Wᵀ·τ); init 0 is fine
    s: jnp.ndarray,        # (1, B) per-lane penalty multiplier
    gq: jnp.ndarray,       # (n, B) per-lane Wᵀ·q (constant over the stage)
    l: jnp.ndarray,        # (m, B)
    u: jnp.ndarray,        # (m, B)
    G2: jnp.ndarray,       # (m, n) shared A·W (scaled frame)
    d: jnp.ndarray,        # (n,) pencil eigenvalues
    base_rho: jnp.ndarray,  # (m,) structural ρ vector
    *,
    iters: int,
    alpha: float,
    matmul: str = "delta",
    block_lanes: int = 1024,
    chunks: int = 2,
    unroll: int = 8,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``iters`` fused v-space ADMM iterations, batch-minor; returns (v, τ).

    ``B`` must be a multiple of ``block_lanes`` (the sweep path pads batch
    sizes to powers of two anyway; ``block_lanes`` drops to ``B`` when the
    batch is smaller, and halves when the operands exceed the VMEM budget
    at the requested size). ±inf bounds are supported. ``interpret``
    defaults to True off-TPU (CPU tests) and False on TPU. See the module
    docstring for the accuracy contract of each ``matmul`` mode and
    ``_stage_kernel_t`` for ``chunks``/``unroll``; cold ill-conditioned
    lanes that need iterative refinement should run ``backend="xla"`` with
    ``refine=True``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if matmul not in ("delta", "split", "f32"):
        raise ValueError(f"unknown matmul mode {matmul!r}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    m, B = v.shape
    n = tau.shape[0]
    block_lanes = min(block_lanes, B)
    # VMEM guard: delta carries ~ (3m + 2n) rows of carries + (3m + 2n)
    # input rows (double-buffered) per block column; cap the resident bytes
    # at ~8 MB so revolving buffers + operators always fit in 16 MB.
    rows = (3 * m + 2 * n) * (2 if matmul == "delta" else 1) + (3 * m + 3 * n)
    while block_lanes > 256 and rows * block_lanes * 4 > 8 * 1024 * 1024:
        block_lanes //= 2
    while B % block_lanes:
        block_lanes //= 2
    if block_lanes < 1:
        raise ValueError(f"batch {B} not tileable")
    # chunked column sub-tiles need 128-lane alignment; chunks=1 uses the
    # full block width (any lane count — Mosaic pads), so never drop below 1
    # (ADVICE r3: the unguarded loop div-by-zeroed on B < 128 or B % 128)
    chunks = max(1, min(chunks, block_lanes // 128))
    while chunks > 1 and block_lanes % (chunks * 128):
        chunks -= 1

    grid = (B // block_lanes,)
    lane = lambda rows: pl.BlockSpec((rows, block_lanes), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    # structural ρ folded into the left operator: Gᵀρ = (ρ ⊙ G₂)ᵀ
    Gt_rho = (base_rho[:, None] * G2).T                  # (n, m)

    kernel = functools.partial(
        _stage_kernel_t, iters=iters, alpha=float(alpha), matmul=matmul,
        chunks=chunks, unroll=max(1, unroll),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane(m), lane(n), lane(1), lane(n), lane(m), lane(m),
            full(n, m), full(m, n), full(n, 1),
        ],
        out_specs=[lane(m), lane(n)],
        # v/τ are consumed by this stage only: alias them onto the outputs
        # so the stage needs no extra HBM output buffers
        input_output_aliases={0: 0, 1: 1},
        # under shard_map's vma typing, outputs inherit the iterates' varying
        # mesh axes (v/τ are batch-sharded; the shared operators are not)
        out_shape=[
            jax.ShapeDtypeStruct((m, B), v.dtype, vma=jax.typeof(v).vma),
            jax.ShapeDtypeStruct((n, B), tau.dtype, vma=jax.typeof(tau).vma),
        ],
        interpret=interpret,
    )(
        v, tau, s, gq, l, u, Gt_rho, G2, d.reshape(n, 1),
    )


def admm_stage(
    v: jnp.ndarray,        # (B, m) pre-clip constraint-space iterate
    tau: jnp.ndarray,      # (B, n) spectral primal; init 0 is fine
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
    matmul: str = "delta",
    block_lanes: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lane-major convenience wrapper around :func:`admm_stage_t`.

    Transposes the iterates in and out (one HBM round-trip each way).
    ``blf_tpu.mpc.qp.solve_qp_factored`` keeps its iterates batch-minor
    across the whole stage scan instead, so it calls :func:`admm_stage_t`
    directly — use that entry point for anything hot.
    """
    v_t, tau_t = admm_stage_t(
        v.T, tau.T, s.T, gq.T, l.T, u.T, G2, d, base_rho,
        iters=iters, alpha=alpha, matmul=matmul,
        block_lanes=block_lanes, interpret=interpret,
    )
    return v_t.T, tau_t.T
