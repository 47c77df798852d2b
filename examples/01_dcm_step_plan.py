"""BASELINE config 1 — single LIPM/DCM step plan.

Fixed 2-footstep sequence (stand on (0, -0.1), step to (0.2, 0.1)), 1.5 s
horizon at dt = 0.1: build the sparse DCM-MPC transcription, solve it with
the batched ADMM, and report the DCM tracking error against the analytic
backward recursion (the reference trajectory the plan should follow inside
the support polygons).

Run: JAX_PLATFORMS=cpu python examples/01_dcm_step_plan.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from blf_tpu.models.lipm import LIPMParams, dcm_backward_recursion
from blf_tpu.mpc.dcm import solve_dcm_mpc

PARAMS = LIPMParams(jnp.asarray(0.9), jnp.asarray(9.81))
DT, N = 0.1, 15                       # 1.5 s horizon


def foot_polygon(center, half_length=0.07, half_width=0.04):
    A = np.array([[1.0, 0], [-1.0, 0], [0, 1.0], [0, -1.0]])
    b = np.array([center[0] + half_length, -(center[0] - half_length),
                  center[1] + half_width, -(center[1] - half_width)])
    return A, b


def main():
    footholds = np.array([[0.0, -0.1], [0.2, 0.1]])
    zmp_ref = np.repeat(footholds, [8, 7], axis=0)                 # (N, 2)
    dcm_ref = dcm_backward_recursion(
        PARAMS, jnp.asarray(zmp_ref), jnp.asarray(footholds[-1]), DT
    )
    polys = [foot_polygon(zmp_ref[k]) for k in range(N)]
    poly_A = jnp.asarray(np.stack([p[0] for p in polys]))
    poly_b = jnp.asarray(np.stack([p[1] for p in polys]))
    dcm0 = com0 = jnp.array([0.0, -0.05])

    plan = solve_dcm_mpc(PARAMS, DT, dcm0, com0, dcm_ref,
                         jnp.asarray(zmp_ref), poly_A, poly_b,
                         iterations=400)

    margins = np.einsum("kfa,ka->kf", np.asarray(poly_A),
                        np.asarray(plan.zmp)) - np.asarray(poly_b)
    rmse = float(jnp.sqrt(jnp.mean((plan.dcm[1:] - dcm_ref[1:]) ** 2)))
    print(f"converged:        {bool(plan.qp.converged)}")
    print(f"worst ZMP margin: {margins.max():+.2e}  (≤ 0 means inside)")
    print(f"DCM-vs-reference: {rmse:.4f} m RMSE")
    print(f"terminal DCM:     {np.round(np.asarray(plan.dcm[-1]), 3)} "
          f"(target {footholds[-1]})")


if __name__ == "__main__":
    main()
