"""Riccati/LQR solvers: sequential scan + parallel-in-time associative scan.

The framework's "sequence parallelism" component (SURVEY.md §5 long-context
row): the reference has no sequence dimension at all — its integrator loops
time serially (``FixedStepIntegrator.tpp:48-61``) — and the structural
analogue of long-context parallelism here is the **MPC horizon**. This module
provides the linear-quadratic backbone both ways:

- :func:`solve_lqr` with ``parallel=False``: classic backward Riccati
  recursion as a ``lax.scan`` (O(T) depth, cache-friendly — the default);
- ``parallel=True``: the associative-scan formulation of Särkkä &
  García-Fernández ("Temporal Parallelization of Dynamic Programming and
  Linear Quadratic ..."), O(log T) depth — the building block for sharding a
  long horizon across a mesh axis (ICI block exchange), enabled single-chip
  first exactly as SURVEY.md §7 plans ("gate behind a flag; serial scan is
  the fallback").

Problem: ``min Σ_k ½ xₖᵀQₖxₖ + ½ uₖᵀRₖuₖ  +  ½ x_TᵀQ_T x_T``
subject to ``x_{k+1} = Fₖ xₖ + Lₖ uₖ + cₖ``.

Both paths return identical feedback gains/value functions (tests assert it)
and the optimal trajectory from any ``x₀``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["LQRSolution", "solve_lqr"]

_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


class LQRSolution(NamedTuple):
    gains: jnp.ndarray          # (T, nu, nx) feedback K_k (u = −K x − k_ff)
    feedforward: jnp.ndarray    # (T, nu)
    value_matrices: jnp.ndarray  # (T+1, nx, nx) Riccati P_k
    value_vectors: jnp.ndarray   # (T+1, nx) linear value terms p_k
    states: jnp.ndarray         # (T+1, nx) optimal rollout from x0
    controls: jnp.ndarray       # (T, nu)


def _sequential_value(Fs, cs, Ls, Qs, Rs, QT):
    """Backward Riccati via lax.scan: P_k, p_k for k = T..0."""
    nx = Fs.shape[-1]

    def step(carry, inputs):
        P, p = carry
        F, c, L, Q, R = inputs
        # u* = −(R + LᵀPL)⁻¹ Lᵀ(P(Fx + c) + p)
        H = R + _mm(L.T, _mm(P, L))
        G = _mm(L.T, _mm(P, F))
        g = _mm(L.T, (_mm(P, c[:, None])[:, 0] + p)[:, None])[:, 0]
        K = jnp.linalg.solve(H, G)
        kff = jnp.linalg.solve(H, g[:, None])[:, 0]
        FKL = F - _mm(L, K)
        P_new = Q + _mm(F.T, _mm(P, FKL))
        p_new = (
            _mm(FKL.T, (p + _mm(P, c[:, None])[:, 0])[:, None])[:, 0]
            - _mm(G.T, kff[:, None])[:, 0] * 0.0
        )
        # p_new: standard form p⁻ = Fᵀ(p + Pc) − Kᵀ(g) … keep the exact
        # derivation: p_new = FKLᵀ (P c + p)  (+ Q x_ref terms = 0 here)
        p_new = _mm(FKL.T, (_mm(P, c[:, None])[:, 0] + p)[:, None])[:, 0]
        return (P_new, p_new), (K, kff, P_new, p_new)

    (P0, p0), (Ks, kffs, Ps, ps) = jax.lax.scan(
        step, (QT, jnp.zeros((nx,), Fs.dtype)), (Fs, cs, Ls, Qs, Rs),
        reverse=True,
    )
    Ps = jnp.concatenate([Ps, QT[None]], axis=0)
    ps = jnp.concatenate([ps, jnp.zeros((1, nx), Fs.dtype)], axis=0)
    # scan with reverse=True returns ys in forward order; Ps[k] is the value
    # at knot k (after the backward update), terminal appended.
    return Ks, kffs, Ps, ps


def _parallel_value(Fs, cs, Ls, Qs, Rs, QT):
    """Associative-scan Riccati (Särkkä & García-Fernández elements).

    Element e = (A, b, C, η, J) represents the conditional value function
    between two knots; composition is associative, so a reversed
    ``associative_scan`` yields every suffix value function in O(log T) depth.
    """
    nx = Fs.shape[-1]
    dtype = Fs.dtype
    eye = jnp.eye(nx, dtype=dtype)

    # per-interval elements
    Cs = jnp.einsum("kij,kjl,kml->kim", Ls, jnp.linalg.inv(Rs), Ls,
                    precision=_PREC)
    elems = (
        Fs,                                   # A
        cs,                                   # b
        Cs,                                   # C
        jnp.zeros((Fs.shape[0], nx), dtype),  # η
        Qs,                                   # J
    )
    # terminal element
    term = (
        jnp.zeros((1, nx, nx), dtype),
        jnp.zeros((1, nx), dtype),
        jnp.zeros((1, nx, nx), dtype),
        jnp.zeros((1, nx), dtype),
        QT[None],
    )
    elems = jax.tree_util.tree_map(
        lambda a, t: jnp.concatenate([a, t], axis=0), elems, term
    )

    def combine(e_ij, e_jk):
        A1, b1, C1, eta1, J1 = e_ij
        A2, b2, C2, eta2, J2 = e_jk
        I = jnp.broadcast_to(eye, A1.shape)
        D = jnp.linalg.inv(I + _mm(C1, J2))        # (…, nx, nx)
        Dt = jnp.linalg.inv(I + _mm(J2, C1))
        A = _mm(A2, _mm(D, A1))
        b = _mm(A2, _mm(D, (b1 + _mm(C1, eta2[..., None])[..., 0])[..., None])
                )[..., 0] + b2
        C = _mm(A2, _mm(D, _mm(C1, jnp.swapaxes(A2, -1, -2)))) + C2
        eta = _mm(
            jnp.swapaxes(A1, -1, -2),
            _mm(Dt, (eta2 - _mm(J2, b1[..., None])[..., 0])[..., None]),
        )[..., 0] + eta1
        J = _mm(jnp.swapaxes(A1, -1, -2), _mm(Dt, _mm(J2, A1))) + J1
        return (A, b, C, eta, J)

    # reverse=True flips, prefix-scans, flips back — so the binary op sees its
    # arguments in (later, earlier) original-order; swap to keep combine's
    # (e_ij, e_jk) convention.
    suffix = jax.lax.associative_scan(
        lambda a, b: combine(b, a), elems, reverse=True, axis=0
    )
    _, _, _, etas, Js = suffix
    # value at knot k: V_k(x) = ½xᵀ J_k x − η_kᵀ x (+const)
    Ps = Js
    ps = -etas

    # gains from the one-step argmin against V_{k+1}
    def gains(F, c, L, R, P_next, p_next):
        H = R + _mm(L.T, _mm(P_next, L))
        K = jnp.linalg.solve(H, _mm(L.T, _mm(P_next, F)))
        g = _mm(L.T, (_mm(P_next, c[:, None])[:, 0] + p_next)[:, None])[:, 0]
        kff = jnp.linalg.solve(H, g[:, None])[:, 0]
        return K, kff

    Ks, kffs = jax.vmap(gains)(Fs, cs, Ls, Rs, Ps[1:], ps[1:])
    return Ks, kffs, Ps, ps


def solve_lqr(
    Fs: jnp.ndarray,   # (T, nx, nx)
    cs: jnp.ndarray,   # (T, nx)
    Ls: jnp.ndarray,   # (T, nx, nu)
    Qs: jnp.ndarray,   # (T, nx, nx) state costs at knots 0..T−1
    Rs: jnp.ndarray,   # (T, nu, nu)
    QT: jnp.ndarray,   # (nx, nx) terminal cost
    x0: jnp.ndarray,   # (nx,)
    *,
    parallel: bool = False,
) -> LQRSolution:
    """Finite-horizon time-varying LQR; see module docstring.

    ``parallel=True`` uses the O(log T)-depth associative scan (identical
    result; wins when T is large and/or the horizon is sharded over a mesh).
    """
    if parallel:
        Ks, kffs, Ps, ps = _parallel_value(Fs, cs, Ls, Qs, Rs, QT)
    else:
        Ks, kffs, Ps, ps = _sequential_value(Fs, cs, Ls, Qs, Rs, QT)

    def rollout(x, inputs):
        F, c, L, K, kff = inputs
        u = -(_mm(K, x[:, None])[:, 0] + kff)
        x_next = _mm(F, x[:, None])[:, 0] + _mm(L, u[:, None])[:, 0] + c
        return x_next, (x_next, u)

    _, (xs, us) = jax.lax.scan(rollout, x0, (Fs, cs, Ls, Ks, kffs))
    xs = jnp.concatenate([x0[None], xs], axis=0)
    return LQRSolution(
        gains=Ks, feedforward=kffs, value_matrices=Ps, value_vectors=ps,
        states=xs, controls=us,
    )
