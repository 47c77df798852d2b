"""BASELINE config 2 — spring–damper foot rollout + RLS identification.

Roll a rigid foot out on the continuous spring–damper contact model
(reference ``ContinuousContactModel``), then identify the spring/damper
coefficients online with the recursive-least-squares estimator wired to the
contact model's regressor — the exact pairing the reference's Estimators
component was built for (SURVEY.md §3.2).

Run: JAX_PLATFORMS=cpu python examples/02_contact_identification.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from blf_tpu.estimators.rls import init_from_handler, rls_scan
from blf_tpu.models import contact
from blf_tpu.models.foot import FootParams, FootState, foot_euler_step
from blf_tpu.utils.params import ParametersHandler


def main():
    true_k, true_b = 8000.0, 400.0
    cparams = contact.ContactParams(
        jnp.asarray(0.12), jnp.asarray(0.09),
        jnp.asarray(true_k), jnp.asarray(true_b),
    )
    fparams = FootParams(mass=jnp.asarray(0.8),
                         inertia=jnp.asarray([2e-3, 3e-3, 4e-3]),
                         baumgarte_rho=jnp.asarray(1.0))
    null_p, null_R = jnp.zeros(3), jnp.eye(3)

    # drop the foot 5 mm below its null pose, slightly moving, and record the
    # settling trajectory (2000 Euler steps at 0.1 ms)
    state0 = FootState(
        position=jnp.array([0.0, 0.0, -0.005]),
        rotation=jnp.eye(3),
        linear_velocity=jnp.array([0.05, -0.03, 0.0]),
        angular_velocity=jnp.array([0.1, 0.2, -0.1]),
    )

    def step(s, _):
        s2 = foot_euler_step(cparams, fparams, s, null_p, null_R, 1e-4)
        return s2, s2

    _, traj = jax.lax.scan(step, state0, None, length=2000)

    # measured wrenches (noisy) + model regressor along the trajectory
    T = traj.position.shape[0]
    cstates = contact.ContactState(
        position=traj.position, rotation=traj.rotation,
        linear_velocity=traj.linear_velocity,
        angular_velocity=traj.angular_velocity,
        null_position=jnp.zeros((T, 3)),
        null_rotation=jnp.broadcast_to(jnp.eye(3), (T, 3, 3)),
    )
    regressors = contact.regressor(cparams, cstates)               # (T, 6, 2)
    rng = np.random.default_rng(0)
    wrenches = contact.contact_wrench(cparams, cstates)
    wrenches = wrenches + jnp.asarray(
        rng.normal(0, 0.05, wrenches.shape), wrenches.dtype)

    # reference-parity config keys (RecursiveLeastSquare.cpp:40-76)
    handler = ParametersHandler({
        "lambda": 1.0,
        "measurement_covariance": [0.05 ** 2] * 6,
        "state": [0.0, 0.0],
        "state_covariance": [1e6, 1e6],
    })
    params, rls0 = init_from_handler(handler)
    final = rls_scan(params, rls0, regressors, wrenches)
    k_hat, b_hat = (float(x) for x in final.theta)
    print(f"true  (k, b): ({true_k:.1f}, {true_b:.1f})")
    print(f"RLS   (k, b): ({k_hat:.1f}, {b_hat:.1f})")
    print(f"rel. error:   {abs(k_hat - true_k) / true_k:.2%}, "
          f"{abs(b_hat - true_b) / true_b:.2%}")


if __name__ == "__main__":
    main()
