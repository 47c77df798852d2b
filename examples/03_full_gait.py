"""BASELINE config 3 — 10-step gait with convex-hull ZMP constraints.

Author an alternating footstep schedule with the reference-semantics contact
lists, lower it to dense per-knot support polygons (single/double support
hulls), build gait references, and solve the whole 9.6 s gait as ONE batched
QP.

Run: JAX_PLATFORMS=cpu python examples/03_full_gait.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from blf_tpu.models.lipm import LIPMParams
from blf_tpu.planners.gait import footstep_plan, plan_gait, support_polygons

PARAMS = LIPMParams(jnp.asarray(0.9), jnp.asarray(9.81))
DT = 0.1


def main():
    lists = footstep_plan(num_steps=10, step_length=0.15)
    for name, lst in lists.items():
        last = lst.last_contact()
        print(f"{name}: {len(lst)} stance windows, last foothold "
              f"{np.round(np.asarray(last.position[:2]), 3)} "
              f"until t={last.deactivation_time:.1f}s")

    dcm0 = com0 = jnp.array([0.0, 0.0])
    plan, schedule = plan_gait(PARAMS, lists, DT, dcm0, com0, iterations=2000)

    poly_A, poly_b = support_polygons(schedule)
    margins = np.einsum("kfa,ka->kf", np.asarray(poly_A),
                        np.asarray(plan.zmp)) - np.asarray(poly_b)
    com = np.asarray(plan.com)
    print(f"knots:            {plan.zmp.shape[0]} ({plan.zmp.shape[0]*DT:.1f} s)")
    print(f"converged:        {bool(plan.qp.converged)}")
    print(f"worst ZMP margin: {margins.max():+.2e}  (≤ 0 means inside hull)")
    print(f"final DCM:        {np.round(np.asarray(plan.dcm[-1]), 3)}")
    print(f"CoM walked:       {com[0, 0]:.2f} → {com[-1, 0]:.2f} m forward, "
          f"lateral sway ±{np.abs(com[:, 1]).max():.3f} m")


if __name__ == "__main__":
    main()
