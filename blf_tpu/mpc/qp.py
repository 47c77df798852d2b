"""Batched fixed-iteration ADMM quadratic-program solver (OSQP-style).

The new-component solver SURVEY.md §7 mandates ("QP solver (batched
ADMM/OSQP-style)"; BASELINE.json north star): one ``jit``ted solver handling
thousands of heterogeneous scenarios with **no data-dependent control flow** —
fixed iteration count, per-lane convergence *flags* instead of early exit
(SURVEY.md §5 "failure detection": status codes carried in the batch).

Problem form (OSQP):  ``min ½ xᵀPx + qᵀx  s.t.  l ≤ Ax ≤ u``.

Iteration (α-relaxed ADMM, per-constraint penalty ρ):

    (P + σI + AᵀρA) x̃ = σx − q + Aᵀ(ρz − y)
    x⁺ = αx̃ + (1−α)x
    z⁺ = clip(α A x̃ + (1−α) z + y/ρ, l, u)
    y⁺ = y + ρ (α A x̃ + (1−α) z − z⁺)

The KKT matrix is factored **once** per solve (batched Cholesky — MXU work)
and reused across iterations; equality rows (l == u) get a stiffer ρ as in
OSQP. Everything broadcasts over leading batch axes and is ``vmap``-free by
construction (but composes with ``vmap``/``shard_map`` for sharded sweeps).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["QPSolution", "solve_qp", "solve_qp_shared"]

# TPU MXU defaults to bf16-accumulated matmuls for f32 inputs, which floors
# ADMM residuals around 1e-3; all solver contractions force full f32 passes.
_PRECISION = jax.lax.Precision.HIGHEST


def _einsum(spec, *ops):
    return jnp.einsum(spec, *ops, precision=_PRECISION)


def _f32_matmuls(fn):
    """Run every matmul traced inside `fn` (including the blocked matmuls in
    cholesky/triangular_solve lowerings) at full f32 on TPU. The MXU's bf16
    default biases the ADMM fixed point: residuals stall at ~1e-2 regardless
    of iteration count. Measured cost on the fleet tick: none (HBM-bound)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped





class QPSolution(NamedTuple):
    """Per-lane solution + diagnostics (no exceptions on device — SURVEY.md §5)."""

    x: jnp.ndarray               # (…, n) primal solution
    y: jnp.ndarray               # (…, m) dual solution
    z: jnp.ndarray               # (…, m) constraint-space iterate
    primal_residual: jnp.ndarray  # (…,) ‖Ax − z‖∞
    dual_residual: jnp.ndarray    # (…,) ‖Px + q + Aᵀy‖∞
    converged: jnp.ndarray        # (…,) bool
    objective: jnp.ndarray        # (…,) ½xᵀPx + qᵀx


@_f32_matmuls
def solve_qp(
    P: jnp.ndarray,
    q: jnp.ndarray,
    A: jnp.ndarray,
    l: jnp.ndarray,
    u: jnp.ndarray,
    *,
    iterations: int = 200,
    rho: float = 1.0,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    eps_abs: float = 1e-5,
    eps_rel: float = 1e-5,
    rho_eq_scale: float = 1e3,
    scaling_iters: int = 10,
    check_every: int = 25,
    x0: Optional[jnp.ndarray] = None,
    y0: Optional[jnp.ndarray] = None,
    unroll: int = 1,
) -> QPSolution:
    """Solve ``min ½xᵀPx + qᵀx s.t. l ≤ Ax ≤ u`` with fixed-iteration ADMM.

    Shapes: ``P`` (…, n, n) SPSD, ``q`` (…, n), ``A`` (…, m, n), ``l``/``u``
    (…, m) (use ∓∞ for one-sided rows, ``l == u`` for equalities). ``x0``/``y0``
    warm-start the iteration — the key latency lever in receding-horizon MPC.

    ``scaling_iters`` rounds of Ruiz equilibration precondition the problem
    (OSQP's scaling): essential for one jitted solve to handle thousands of
    heterogeneously-conditioned scenarios (SURVEY.md §7 "batched QP
    robustness"). Residuals/solution are reported in the ORIGINAL scaling.
    """
    P, q, A = jnp.asarray(P), jnp.asarray(q), jnp.asarray(A)
    l, u = jnp.asarray(l), jnp.asarray(u)
    n, m = P.shape[-1], A.shape[-2]
    dtype = P.dtype

    # -- Ruiz equilibration: P̄ = c·D P D, Ā = E A D, q̄ = c·D q, l̄/ū = E l/u --
    P_orig, q_orig, A_orig = P, q, A
    D = jnp.ones(P.shape[:-2] + (n,), dtype=dtype)
    E = jnp.ones(A.shape[:-2] + (m,), dtype=dtype)
    c = jnp.ones(jnp.broadcast_shapes(P.shape[:-2], q.shape[:-1]), dtype=dtype)
    for _ in range(scaling_iters):
        col_norm = jnp.maximum(
            jnp.max(jnp.abs(P), axis=-2), jnp.max(jnp.abs(A), axis=-2)
        )
        dx = 1.0 / jnp.sqrt(jnp.where(col_norm > 1e-12, col_norm, 1.0))
        row_norm = jnp.max(jnp.abs(A), axis=-1)
        de = 1.0 / jnp.sqrt(jnp.where(row_norm > 1e-12, row_norm, 1.0))
        P = dx[..., :, None] * P * dx[..., None, :]
        A = de[..., :, None] * A * dx[..., None, :]
        q = q * dx
        D = D * dx
        E = E * de
        # cost normalisation
        p_cols = jnp.mean(jnp.max(jnp.abs(P), axis=-2), axis=-1)
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(p_cols, jnp.max(jnp.abs(q), axis=-1)), 1e-12
        )
        P = gamma[..., None, None] * P
        q = gamma[..., None] * q
        c = c * gamma
    l = E * l
    u = E * u
    if x0 is not None:
        x0 = x0 / D                      # x̄ = D⁻¹ x
    if y0 is not None:
        y0 = c[..., None] * y0 / E       # ȳ = c E⁻¹ y  (y = E ȳ / c)

    is_eq = (u - l) < 1e-12
    base_rho = jnp.where(is_eq, rho * rho_eq_scale, rho).astype(dtype)

    At = jnp.swapaxes(A, -1, -2)

    batch = jnp.broadcast_shapes(
        P.shape[:-2], q.shape[:-1], A.shape[:-2], l.shape[:-1], u.shape[:-1],
        () if x0 is None else x0.shape[:-1],
        () if y0 is None else y0.shape[:-1],
    )
    # Initial iterates are derived from (or merged with) the inputs rather
    # than fresh constants, so that under shard_map the scan carries inherit
    # the union of the inputs' varying mesh axes.
    x = jnp.broadcast_to(q * 0 if x0 is None else x0 + q * 0, batch + (n,))
    z = jnp.broadcast_to(_einsum("...mn,...n->...m", A, x), batch + (m,))
    zero_m = z * 0 + (l * 0 + u * 0) * 0 if jnp.issubdtype(dtype, jnp.floating) else z * 0
    zero_m = jnp.where(jnp.isnan(zero_m), 0.0, zero_m)  # ±inf bounds → 0·inf = nan
    y = jnp.broadcast_to(zero_m if y0 is None else y0 + zero_m, batch + (m,))

    def run_stage(x, z, y, rho_scale):
        """`check_every` ADMM iterations at a fixed per-lane ρ (refactored)."""
        rho_vec = base_rho * rho_scale[..., None]           # (batch, m)
        kkt = (
            P
            + sigma * jnp.eye(n, dtype=dtype)
            + _einsum("...nm,...m,...mk->...nk", At, rho_vec, A)
        )
        chol = jnp.linalg.cholesky(
            jnp.broadcast_to(kkt, batch + (n, n))
        )

        def body(carry, _):
            x, z, y = carry
            rhs = sigma * x - q + _einsum(
                "...nm,...m->...n", At, rho_vec * z - y
            )
            x_tilde = jax.scipy.linalg.cho_solve((chol, True), rhs[..., None])[..., 0]
            x_next = alpha * x_tilde + (1 - alpha) * x
            Ax_tilde = _einsum("...mn,...n->...m", A, x_tilde)
            z_relaxed = alpha * Ax_tilde + (1 - alpha) * z
            z_next = jnp.clip(z_relaxed + y / rho_vec, l, u)
            y_next = y + rho_vec * (z_relaxed - z_next)
            return (x_next, z_next, y_next), None

        (x, z, y), _ = jax.lax.scan(
            body, (x, z, y), None, length=check_every, unroll=unroll
        )
        return x, z, y

    check_every = max(1, min(check_every, iterations))
    n_stages = max(1, -(-iterations // check_every))

    def stage(carry, _):
        x, z, y, rho_scale = carry
        x, z, y = run_stage(x, z, y, rho_scale)
        # OSQP adaptive ρ: balance relative primal vs dual residuals per lane.
        Ax = _einsum("...mn,...n->...m", A, x)
        Px_ = _einsum("...nm,...m->...n", P, x)
        Aty_ = _einsum("...nm,...m->...n", At, y)
        rp = jnp.max(jnp.abs(Ax - z), axis=-1) / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Ax), -1), jnp.max(jnp.abs(z), -1)), 1e-12
        )
        rd = jnp.max(jnp.abs(Px_ + q + Aty_), axis=-1) / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px_), -1),
                        jnp.maximum(jnp.max(jnp.abs(Aty_), -1),
                                    jnp.max(jnp.abs(q), -1))), 1e-12
        )
        scale = jnp.sqrt(rp / jnp.maximum(rd, 1e-12))
        rho_scale = jnp.clip(
            rho_scale * jnp.clip(scale, 0.2, 5.0), 1e-6, 1e6
        )
        return (x, z, y, rho_scale), None

    rho_scale = jnp.broadcast_to(x[..., 0] * 0 + 1, batch)
    (x, z, y, rho_scale), _ = jax.lax.scan(
        stage, (x, z, y, rho_scale), None, length=n_stages
    )

    # -- unscale and report residuals in the original problem ----------------
    x = D * x
    y = E * y / c[..., None]
    z = z / E

    Ax = _einsum("...mn,...n->...m", A_orig, x)
    r_prim = jnp.max(jnp.abs(Ax - z), axis=-1)
    Px = _einsum("...nm,...m->...n", P_orig, x)
    Aty = _einsum("...nm,...m->...n", jnp.swapaxes(A_orig, -1, -2), y)
    r_dual = jnp.max(jnp.abs(Px + q_orig + Aty), axis=-1)
    # OSQP-style relative tolerances (scale-free convergence check)
    prim_tol = eps_abs + eps_rel * jnp.maximum(
        jnp.max(jnp.abs(Ax), axis=-1), jnp.max(jnp.abs(z), axis=-1)
    )
    dual_tol = eps_abs + eps_rel * jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(Px), axis=-1), jnp.max(jnp.abs(Aty), axis=-1)),
        jnp.max(jnp.abs(q_orig), axis=-1),
    )
    converged = (r_prim < prim_tol) & (r_dual < dual_tol)
    objective = 0.5 * _einsum("...n,...nm,...m->...", x, P_orig, x) + _einsum(
        "...n,...n->...", q_orig, x
    )
    return QPSolution(x, y, z, r_prim, r_dual, converged, objective)


@_f32_matmuls
def solve_qp_shared(
    P: jnp.ndarray,
    q: jnp.ndarray,
    A: jnp.ndarray,
    l: jnp.ndarray,
    u: jnp.ndarray,
    *,
    iterations: int = 200,
    rho: float = 1.0,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    eps_abs: float = 1e-5,
    eps_rel: float = 1e-5,
    rho_eq_scale: float = 1e3,
    scaling_iters: int = 10,
    check_every: int = 25,
    x0: Optional[jnp.ndarray] = None,
    y0: Optional[jnp.ndarray] = None,
    unroll: int = 1,
    backend: str = "xla",
    refine: bool = True,
) -> QPSolution:
    """ADMM for a scenario fleet sharing ONE (P, A) with per-lane (q, l, u).

    The throughput path of the framework (SURVEY.md §2.3 "scenario batching"):
    when every lane solves the same transcription (same horizon, same
    polygons) with different initial states/references, the KKT matrix is
    factored ONCE per stage and every per-iteration product becomes a dense
    ``(B, ·) × (·, ·)`` GEMM on the MXU — instead of B independent tiny
    factorizations and matvecs. ~order-of-magnitude faster than
    :func:`solve_qp` at large B; bit-compatible semantics except that Ruiz
    cost-normalisation and adaptive ρ use fleet-averaged statistics (the
    matrices must stay shared).

    Shapes: ``P`` (n, n), ``A`` (m, n) — strictly unbatched; ``q`` (…, n),
    ``l``/``u`` (…, m) carry the batch.
    """
    P, q, A = jnp.asarray(P), jnp.asarray(q), jnp.asarray(A)
    l, u = jnp.asarray(l), jnp.asarray(u)
    if P.ndim != 2 or A.ndim != 2:
        raise ValueError("solve_qp_shared requires unbatched P and A")
    n, m = P.shape[-1], A.shape[-2]
    dtype = P.dtype
    batch = jnp.broadcast_shapes(q.shape[:-1], l.shape[:-1], u.shape[:-1])
    breduce = tuple(range(len(batch)))

    # -- Ruiz equilibration on the shared matrices ---------------------------
    P_orig, q_orig, A_orig = P, q, A
    D = jnp.ones((n,), dtype=dtype)
    E = jnp.ones((m,), dtype=dtype)
    c = jnp.ones((), dtype=dtype)
    for _ in range(scaling_iters):
        col_norm = jnp.maximum(jnp.max(jnp.abs(P), axis=0),
                               jnp.max(jnp.abs(A), axis=0))
        dx = 1.0 / jnp.sqrt(jnp.where(col_norm > 1e-12, col_norm, 1.0))
        row_norm = jnp.max(jnp.abs(A), axis=1)
        de = 1.0 / jnp.sqrt(jnp.where(row_norm > 1e-12, row_norm, 1.0))
        P = dx[:, None] * P * dx[None, :]
        A = de[:, None] * A * dx[None, :]
        q = q * dx
        D, E = D * dx, E * de
        # fleet-mean cost normalisation (scalar: keeps P shared)
        p_cols = jnp.mean(jnp.max(jnp.abs(P), axis=0))
        q_inf = jnp.mean(jnp.max(jnp.abs(q), axis=-1))
        gamma = 1.0 / jnp.maximum(jnp.maximum(p_cols, q_inf), 1e-12)
        P, q, c = gamma * P, gamma * q, c * gamma
    l, u = E * l, E * u
    if x0 is not None:
        x0 = x0 / D
    if y0 is not None:
        y0 = c * y0 / E

    is_eq = (u - l) < 1e-12
    # equality pattern must be lane-independent for a shared KKT: a row is
    # stiff iff it is an equality in EVERY lane (true for MPC transcriptions,
    # where the split equality/inequality is structural).
    is_eq_shared = jnp.all(is_eq.reshape((-1, m)), axis=0)
    base_rho = jnp.where(is_eq_shared, rho * rho_eq_scale, rho).astype(dtype)

    x = jnp.broadcast_to(q * 0 if x0 is None else x0 + q * 0, batch + (n,))
    z = _einsum("mn,...n->...m", A, x)
    z = jnp.broadcast_to(z, batch + (m,))
    y = jnp.broadcast_to(z * 0 if y0 is None else y0 + z * 0, batch + (m,))

    # -- discrete per-lane ρ ladder ------------------------------------------
    # Per-lane adaptive ρ normally forces per-lane factorizations; instead ρ
    # is restricted to a small geometric ladder ρ·5^{k−2}, k = 0..4. The K
    # KKT matrices are factored ONCE (they never change), every iteration
    # solves all K against the stacked right-hand sides (still GEMM-shaped,
    # K× a cheap trsm), and each lane selects its level's solution. Lanes
    # move up/down the ladder from their own residual ratio — true per-lane
    # adaptation at shared-factorization cost.
    LEVELS = 5
    level_scales = jnp.asarray(
        [5.0 ** (k - LEVELS // 2) for k in range(LEVELS)], dtype
    )
    eye_n = jnp.eye(n, dtype=dtype)
    kkts = jnp.stack([
        P + sigma * eye_n + (A.T * (base_rho * s)) @ A for s in level_scales
    ])                                                        # (K, n, n)
    chols = jnp.linalg.cholesky(kkts)
    # Explicit inverses turn the per-iteration solve into pure GEMMs (the
    # trsm was 64% of device time); one iterative-refinement pass restores
    # the accuracy an f32 inverse loses (bias ~(cond·eps)² ≈ 1e-9).
    kinvs = jax.vmap(
        lambda ch: jax.scipy.linalg.cho_solve((ch, True), eye_n)
    )(chols)                                                   # (K, n, n)

    use_pallas = (
        backend == "pallas"
        and q.ndim == 1
        and len(batch) == 1
        and batch[0] % 256 == 0
    )

    def run_stage(x, z, y, level):
        rho_lane = level_scales[level][..., None] * base_rho   # (batch, m)
        # one-hot level select folded into the K-stacked GEMMs (a
        # take_along_axis gather here cost ~20% of device time)
        onehot = jax.nn.one_hot(level, LEVELS, dtype=dtype)    # (batch, K)

        if use_pallas:
            from blf_tpu.ops.pallas.admm import admm_stage

            return admm_stage(
                x, z, y, onehot, rho_lane,
                jnp.broadcast_to(l, batch + (m,)),
                jnp.broadcast_to(u, batch + (m,)),
                q, A, kinvs, kkts,
                iters=check_every, sigma=sigma, alpha=alpha, refine=refine,
            )

        kinv_t = jnp.swapaxes(kinvs, -1, -2)
        kkt_t = jnp.swapaxes(kkts, -1, -2)

        def solve_kkt(rhs):
            cands = _einsum("...n,knm->...km", rhs, kinv_t)       # K GEMMs
            x1 = _einsum("...km,...k->...m", cands, onehot)
            if not refine:
                return x1
            resid_k = rhs[..., None, :] - _einsum("...n,knm->...km", x1, kkt_t)
            corr_k = _einsum("...kn,knm->...km", resid_k, kinv_t)
            return x1 + _einsum("...km,...k->...m", corr_k, onehot)

        def body(carry, _):
            x, z, y = carry
            rhs = sigma * x - q + _einsum("...m,mn->...n", rho_lane * z - y, A)
            x_tilde = solve_kkt(rhs)
            x_next = alpha * x_tilde + (1 - alpha) * x
            Ax_tilde = _einsum("...n,mn->...m", x_tilde, A)
            z_relaxed = alpha * Ax_tilde + (1 - alpha) * z
            z_next = jnp.clip(z_relaxed + y / rho_lane, l, u)
            y_next = y + rho_lane * (z_relaxed - z_next)
            return (x_next, z_next, y_next), None

        (x, z, y), _ = jax.lax.scan(
            body, (x, z, y), None, length=check_every, unroll=unroll
        )
        return x, z, y

    check_every = max(1, min(check_every, iterations))
    n_stages = max(1, -(-iterations // check_every))

    def stage(carry, _):
        x, z, y, level = carry
        x, z, y = run_stage(x, z, y, level)
        Ax = _einsum("...n,mn->...m", x, A)
        Px_ = _einsum("...m,nm->...n", x, P)
        Aty_ = _einsum("...m,nm->...n", y, A.T)
        rp = jnp.max(jnp.abs(Ax - z), axis=-1) / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Ax), -1), jnp.max(jnp.abs(z), -1)), 1e-12
        )
        rd = jnp.max(jnp.abs(Px_ + q + Aty_), axis=-1) / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px_), -1),
                        jnp.maximum(jnp.max(jnp.abs(Aty_), -1),
                                    jnp.max(jnp.abs(q), -1))), 1e-12
        )
        # per-lane ladder move: up if primal dominates, down if dual does
        ratio = jnp.sqrt(rp / jnp.maximum(rd, 1e-12))
        move = jnp.where(ratio > 5.0, 1, jnp.where(ratio < 0.2, -1, 0))
        level = jnp.clip(level + move, 0, LEVELS - 1)
        return (x, z, y, level), None

    level0 = jnp.full(batch, LEVELS // 2, dtype=jnp.int32) + (
        jnp.max(x, axis=-1) * 0
    ).astype(jnp.int32)
    (x, z, y, _), _ = jax.lax.scan(
        stage, (x, z, y, level0), None, length=n_stages
    )

    # -- unscale + diagnostics in the original problem -----------------------
    x = D * x
    y = E * y / c
    z = z / E
    Ax = _einsum("...n,mn->...m", x, A_orig)
    r_prim = jnp.max(jnp.abs(Ax - z), axis=-1)
    Px = _einsum("...m,nm->...n", x, P_orig)
    Aty = _einsum("...m,mn->...n", y, A_orig)
    r_dual = jnp.max(jnp.abs(Px + q_orig + Aty), axis=-1)
    prim_tol = eps_abs + eps_rel * jnp.maximum(
        jnp.max(jnp.abs(Ax), axis=-1), jnp.max(jnp.abs(z), axis=-1)
    )
    dual_tol = eps_abs + eps_rel * jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(Px), axis=-1), jnp.max(jnp.abs(Aty), axis=-1)),
        jnp.max(jnp.abs(q_orig), axis=-1),
    )
    converged = (r_prim < prim_tol) & (r_dual < dual_tol)
    objective = 0.5 * jnp.sum(x * Px, axis=-1) + jnp.sum(q_orig * x, axis=-1)
    return QPSolution(x, y, z, r_prim, r_dual, converged, objective)
