"""Component-level timing of the FLEET-NATIVE config-4 stack tick (r5).

Times, at a given batch on the real chip, the pieces of
``make_fleet_stack_step`` with the production kernel backends:

  - DCM-MPC batched solve (shared-factor Pallas ADMM),
  - 10x vmapped WBC QP build (FK + mass matrix + Jacobians + rows),
  - 10x fused per-lane WBC solve (Ruiz + K build + batch-minor Cholesky
    inverse + lane-kernel stage + polish),
  - per-tick plant prep (lagged M⁻¹ via the Cholesky kernel + ROS2-W
    stage operator via jacfwd + batched inverse),
  - 10x ROS2-W plant window (4 substeps, lagged-M⁻¹ dynamics),
  - 10x estimator chain (momentum observer + attribution + RLS).

Run:  python benchmarks/stack_profile_fleet.py [batch]
Prints one JSON line; the SOL.md stack row cites this breakdown.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def timed(fn, *args, reps=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main(batch: int = 256) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from blf_tpu.models import rigid_body as rb
    from blf_tpu.models.kinematics import forward_kinematics, frame_pose
    from blf_tpu.models.lipm import LIPMParams
    from blf_tpu.models.robots import HUMANOID_SOLE_FRAMES, make_humanoid_23dof
    from blf_tpu.mpc.dcm import solve_dcm_mpc
    from blf_tpu.mpc.qp import solve_qp
    from blf_tpu.mpc.stack import (
        StackConfig, _default_ground, _plant_functions, init_stack)
    from blf_tpu.mpc.wholebody import (
        WholeBodyParams, WholeBodyTask, build_wholebody_qp)
    from blf_tpu.ops.integrators import (
        integrate_rosenbrock, rosenbrock_operator)
    from blf_tpu.ops.pallas.linalg import cholesky_inverse_lane
    from blf_tpu.estimators.wrench_observer import (
        MomentumObserverParams, momentum_observer_step, wrenches_from_residual)
    from blf_tpu.models.kinematics import frame_jacobian

    tree = make_humanoid_23dof()
    wbc = WholeBodyParams(contact_frames=HUMANOID_SOLE_FRAMES)
    n = tree.num_dofs
    horizon = 8
    dtype = jnp.float32

    q = np.zeros(n)
    names, dof = tree.link_names, tree.dof_index
    for side in ("l", "r"):
        q[dof[names.index(f"{side}_upper_leg")]] = 0.25
        q[dof[names.index(f"{side}_lower_leg")]] = -0.5
        q[dof[names.index(f"{side}_ankle_1")]] = 0.25
    qj = jnp.asarray(q, dtype)
    poses0 = forward_kinematics(tree, jnp.zeros(3, dtype),
                                jnp.eye(3, dtype=dtype), qj)
    _, p_sole = frame_pose(tree, poses0, "l_sole")
    plant = rb.FloatingBaseState(
        base_twist=jnp.zeros(6, dtype),
        joint_velocities=jnp.zeros(n, dtype),
        base_position=jnp.asarray([0.0, 0.0, -float(p_sole[2])], dtype),
        base_rotation=jnp.eye(3, dtype=dtype),
        joint_positions=qj,
    )
    poses = forward_kinematics(tree, plant.base_position, plant.base_rotation,
                               plant.joint_positions)
    com = rb.com_position(tree, poses)
    lipm = LIPMParams(jnp.asarray(float(com[2]), dtype),
                      jnp.asarray(9.81, dtype))
    stance = jnp.asarray(com[:2], dtype)
    zmp_ref = jnp.broadcast_to(stance, (horizon, 2))
    dcm_ref = jnp.broadcast_to(stance, (horizon + 1, 2))
    poly_A = jnp.tile(jnp.asarray(
        [[1.0, 0], [-1.0, 0], [0, 1.0], [0, -1.0]], dtype), (horizon, 1, 1))
    half = jnp.asarray([0.09, 0.09, 0.11, 0.11], dtype)
    poly_b = jnp.broadcast_to(
        jnp.asarray([stance[0], -stance[0], stance[1], -stance[1]],
                    dtype) + half,
        (horizon, 4),
    )
    config = StackConfig(mpc_dt=0.1, horizon=horizon, wbc_per_mpc=10,
                         physics_per_wbc=2, plant_method="rosenbrock",
                         mpc_iterations=100, wbc_iterations=150,
                         wbc_check_every=150, wbc_polish_iters=0,
                         wbc_scaling_iters=4,
                         mpc_backend="pallas", wbc_backend="pallas",
                         plant_lagged_minv=True, ros_op_stiff=True)
    null_poses = {}
    for f in HUMANOID_SOLE_FRAMES:
        _, p0 = frame_pose(tree, poses, f)
        null_poses[f] = (jnp.eye(3, dtype=dtype),
                         p0 + jnp.asarray([0.0, 0.0, config.ground_sag],
                                          dtype))
    ground = _default_ground(tree, wbc, config)
    _ground_wrenches, _fdyn, _fdyn_stiff = _plant_functions(tree, ground, null_poses, "imu")
    num_constraints = 2 * horizon + horizon * 4
    state0 = init_stack(tree, lipm, config, plant, num_constraints)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state0)
    rng = np.random.default_rng(0)
    pushes = jnp.asarray(rng.uniform(-8.0, 8.0, (batch, 2)), dtype)
    wbc_dt = config.mpc_dt / config.wbc_per_mpc
    physics_dt = wbc_dt / config.physics_per_wbc

    results = {"batch": batch, "backend": "pallas-fleet"}

    # -- MPC fleet solve -----------------------------------------------------
    dcm0 = jnp.broadcast_to(stance, (batch, 2))
    com0 = jnp.broadcast_to(jnp.asarray(com[:2], dtype), (batch, 2))

    @jax.jit
    def mpc_only(st):
        return solve_dcm_mpc(
            lipm, config.mpc_dt, dcm0, com0, dcm_ref, zmp_ref,
            poly_A, poly_b, iterations=config.mpc_iterations,
            warm_start=st.warm_zmp, warm_start_dual=st.warm_y,
            s0=st.warm_s, shared=True, backend="pallas").zmp
    results["mpc_s"] = round(timed(mpc_only, state), 4)

    # -- WBC build (vmapped) x10 --------------------------------------------
    task0 = WholeBodyTask(
        com_acc_des=jnp.zeros(3, dtype),
        base_ang_acc_des=jnp.zeros(3, dtype),
        posture_acc_des=jnp.zeros(n, dtype),
        contact_active=jnp.ones(2, dtype),
        ext_wrench=jnp.zeros((1, 6), dtype),
    )

    @jax.jit
    def build_only(st):
        def body(carry, _):
            P, q_, A, l, u = jax.vmap(
                lambda p: build_wholebody_qp(tree, wbc, p, task0, ("imu",))
            )(st.plant)
            return carry + P.sum() + A.sum() + q_.sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=10)
        return acc
    results["wbcbuild10_s"] = round(timed(build_only, state), 4)

    # -- WBC fused solve x10 -------------------------------------------------
    P0, q0, A0, l0, u0 = jax.jit(jax.vmap(
        lambda p: build_wholebody_qp(tree, wbc, p, task0, ("imu",))
    ))(state.plant)

    @jax.jit
    def wbcsolve_only(st):
        def body(carry, _):
            x_w, y_w, s_w = carry
            sol = solve_qp(P0, q0 + 1e-6 * x_w[:, :q0.shape[1]], A0, l0, u0,
                           iterations=config.wbc_iterations,
                           x0=x_w, y0=y_w, s0=s_w,
                           check_every=config.wbc_check_every,
                           polish_iters=config.wbc_polish_iters,
                           scaling_iters=config.wbc_scaling_iters,
                           eps_abs=1e-4, eps_rel=1e-4, backend="pallas")
            return (sol.x, sol.y, sol.rho_scale), None
        carry, _ = jax.lax.scan(
            body, (st.warm_wbc_x, st.warm_wbc_y, st.warm_wbc_s),
            None, length=10)
        return carry[0]
    results["wbcsolve10_s"] = round(timed(wbcsolve_only, state), 4)

    # -- plant prep per tick: lagged Minv + ROS2-W operator ------------------
    zero_tau = jnp.zeros(n, dtype)
    push_w = jnp.concatenate([pushes, jnp.zeros((batch, 4), dtype)], axis=-1)

    @jax.jit
    def minv_only(st):
        M = jax.vmap(lambda p: rb.mass_matrix(
            tree, p.base_position, p.base_rotation, p.joint_positions)
        )(st.plant)
        return cholesky_inverse_lane(M)
    results["minv_s"] = round(timed(minv_only, state), 4)
    minv = minv_only(state)

    @jax.jit
    def op_full(st):
        return jax.vmap(
            lambda p, pw, mi: rosenbrock_operator(
                lambda s, tau, t: _fdyn(s, tau, t, pw, minv=mi),
                p, u=zero_tau, dt=physics_dt)
        )(st.plant, push_w, minv)
    results["rosop_full_s"] = round(timed(op_full, state), 4)

    from blf_tpu.models.kinematics import frame_jacobian as _fj

    @jax.jit
    def op_stiff(st):
        def one(p, mi):
            poses_p = forward_kinematics(
                tree, p.base_position, p.base_rotation, p.joint_positions)
            jfro = {f: _fj(tree, poses_p, f) for f in HUMANOID_SOLE_FRAMES}
            return rosenbrock_operator(
                lambda s, u_, t_: _fdyn_stiff(s, mi, jfro),
                p, u=zero_tau, dt=physics_dt)
        return jax.vmap(one)(st.plant, minv)
    results["rosop_stiff_s"] = round(timed(op_stiff, state), 4)
    ros_op = op_stiff(state)

    # -- plant x10 (4 ROS2-W substeps each, lagged Minv) ---------------------
    @jax.jit
    def plant_only(st):
        def one(p, pw, mi, op):
            def body(pp, _):
                pp2 = integrate_rosenbrock(
                    lambda s, tau, t: _fdyn(s, tau, t, pw, minv=mi),
                    pp, dt=physics_dt, num_steps=config.physics_per_wbc,
                    u=zero_tau, operator=op)
                return pp2, None
            p2, _ = jax.lax.scan(body, p, None, length=10)
            return p2
        return jax.vmap(one)(st.plant, push_w, minv, ros_op)
    results["plant10_s"] = round(timed(plant_only, state), 4)

    # -- estimator chain x10 -------------------------------------------------
    obs_params = MomentumObserverParams(gain=jnp.asarray(config.observer_gain),
                                        dt=jnp.asarray(wbc_dt))

    @jax.jit
    def est_only(st):
        def one(obs0, p):
            def body(obs, _):
                obs2, residual = momentum_observer_step(
                    tree, obs_params, obs, p, zero_tau)
                poses_ = forward_kinematics(
                    tree, p.base_position, p.base_rotation, p.joint_positions)
                ft = _ground_wrenches(p, poses_)
                tau_known = sum(
                    frame_jacobian(tree, poses_, f).T @ ft[f]
                    for f in HUMANOID_SOLE_FRAMES)
                wr = wrenches_from_residual(
                    tree, p, ("imu",), residual - tau_known)
                return obs2, wr[-1, :2]
            obs, meas = jax.lax.scan(body, obs0, None, length=10)
            return meas
        return jax.vmap(one)(st.observer, st.plant)
    results["est10_s"] = round(timed(est_only, state), 4)

    accounted = (results["mpc_s"] + results["wbcbuild10_s"]
                 + results["wbcsolve10_s"] + results["minv_s"]
                 + results["rosop_stiff_s"] + results["plant10_s"]
                 + results["est10_s"])
    results["accounted_s"] = round(accounted, 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
