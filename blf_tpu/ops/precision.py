"""Matmul-precision discipline for TPU numerics.

On TPU the MXU contracts f32 operands through bf16 passes by default
(``Precision.DEFAULT``), giving ~2⁻⁸ relative product error. That is fine
for neural nets and catastrophic for this framework's linear algebra:
rotation-chain forward kinematics drift, mass-matrix Cholesky solves lose
~3 digits, and ADMM/QP fixed points shift by more than the convergence
tolerance. Every CPU run hides the problem (CPU has no bf16 fast path), so
it surfaces only on hardware — measured on v5e: the whole-body QP's
in-loop residuals degraded 400× (median 3.2e-3 vs 7.6e-6 on CPU) before
the dynamics/kinematics call chain was wrapped.

:func:`f32_matmuls` is the one shared decorator (previously private to
``blf_tpu.mpc.qp``): it runs everything traced inside the function under
``jax.default_matmul_precision("float32")``. Apply it to public entry
points whose outputs feed solvers or integrators. Pallas kernels manage
their own precision explicitly (bf16 split products ARE the precision) and
are unaffected — Mosaic rejects an inherited f32 contract on bf16 inputs,
which is why the kernels pin ``Precision.DEFAULT`` locally.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["f32_matmuls"]


def f32_matmuls(fn):
    """Run every matmul traced inside ``fn`` at full f32 on TPU."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
