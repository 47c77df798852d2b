"""Component-level timing of the config-4 stack tick (diagnosis harness).

Times, at a given batch on the real chip:
  - the full outer tick (as stack_bench measures),
  - the DCM-MPC solve alone,
  - 10x (build + solve) whole-body QP alone,
  - 10x 40-substep RK4 plant integration alone,
  - 10x estimator chain (observer + attribution + RLS) alone.

Run:  python benchmarks/stack_profile.py [batch]
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
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(batch: int = 256) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from blf_tpu.models import rigid_body as rb
    from blf_tpu.models.kinematics import forward_kinematics, frame_pose, frame_jacobian
    from blf_tpu.models.lipm import LIPMParams
    from blf_tpu.models.robots import HUMANOID_SOLE_FRAMES, make_humanoid_23dof
    from blf_tpu.models.contact import ContactParams, ContactState, contact_wrench
    from blf_tpu.mpc.stack import StackConfig, init_stack, make_stack_step
    from blf_tpu.mpc.dcm import solve_dcm_mpc
    from blf_tpu.mpc.wholebody import (
        WholeBodyParams, WholeBodyTask, build_wholebody_qp, solve_wholebody_qp)
    from blf_tpu.ops.integrators import integrate
    from blf_tpu.estimators.wrench_observer import (
        MomentumObserverParams, init_momentum_observer, momentum_observer_step,
        wrenches_from_residual)

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
                         physics_per_wbc=4, plant_method="rosenbrock",
                         mpc_iterations=100, wbc_iterations=150,
                         wbc_polish_iters=25)
    null_poses = {}
    for f in HUMANOID_SOLE_FRAMES:
        _, p0 = frame_pose(tree, poses, f)
        null_poses[f] = (jnp.eye(3, dtype=dtype),
                         p0 + jnp.asarray([0.0, 0.0, config.ground_sag],
                                          dtype))
    step = make_stack_step(tree, wbc, lipm, config, null_poses,
                           q_ref=plant.joint_positions,
                           com_height_ref=float(com[2]))
    num_constraints = 2 * horizon + horizon * 4
    state0 = init_stack(tree, lipm, config, plant, num_constraints)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state0)
    rng = np.random.default_rng(0)
    pushes = jnp.asarray(rng.uniform(-8.0, 8.0, (batch, 2)), dtype)

    results = {"batch": batch}

    if "--full" in sys.argv:
        full = jax.jit(jax.vmap(
            lambda st, p: step(st, p, dcm_ref, zmp_ref, poly_A, poly_b)))
        t0 = time.perf_counter()
        out = full(state, pushes)
        jax.block_until_ready(out)
        results["full_tick_compile_s"] = round(time.perf_counter() - t0, 1)
        results["full_tick_s"] = round(timed(full, state, pushes), 4)

    # -- MPC alone -----------------------------------------------------------
    @jax.jit
    def mpc_only(st):
        def one(stt):
            com0 = jnp.asarray(com, dtype)
            dcm0 = stance
            return solve_dcm_mpc(
                lipm, config.mpc_dt, dcm0, com0[:2], dcm_ref, zmp_ref,
                poly_A, poly_b, iterations=config.mpc_iterations,
                warm_start=stt.warm_zmp, warm_start_dual=stt.warm_y,
                s0=stt.warm_s, shared=True)
        return jax.vmap(one)(st)
    results["mpc_s"] = round(timed(mpc_only, state), 4)

    # -- WBC build+solve x10 -------------------------------------------------
    task0 = WholeBodyTask(
        com_acc_des=jnp.zeros(3, dtype),
        base_ang_acc_des=jnp.zeros(3, dtype),
        posture_acc_des=jnp.zeros(n, dtype),
        contact_active=jnp.ones(2, dtype),
    )

    @jax.jit
    def wbc_only(st):
        def one(stt):
            def body(carry, _):
                sol = solve_wholebody_qp(
                    tree, wbc, stt.plant, task0,
                    iterations=config.wbc_iterations,
                    polish_iters=config.wbc_polish_iters,
                    eps_abs=1e-4, eps_rel=1e-4)
                return carry + sol.torques.sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=10)
            return acc
        return jax.vmap(one)(st)
    results["wbc10_s"] = round(timed(wbc_only, state), 4)

    # -- WBC build alone x10 -------------------------------------------------
    @jax.jit
    def build_only(st):
        def one(stt):
            def body(carry, _):
                P, q_, A, l, u = build_wholebody_qp(tree, wbc, stt.plant, task0)
                return carry + P.sum() + A.sum() + q_.sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=10)
            return acc
        return jax.vmap(one)(st)
    results["wbcbuild10_s"] = round(timed(build_only, state), 4)

    # -- plant integrate x10 (40 RK4 substeps each) --------------------------
    total_mass = float(tree.total_mass)
    n_feet = 2
    L, W = 2 * wbc.foot_half_length, 2 * wbc.foot_half_width
    per_foot = total_mass * 9.81 / n_feet
    k_eff = per_foot / config.ground_sag
    c_eff = 0.8 * (k_eff * total_mass / n_feet) ** 0.5
    ground = {
        f: ContactParams(jnp.asarray(L), jnp.asarray(W),
                         jnp.asarray(k_eff / (L * W)),
                         jnp.asarray(c_eff / (L * W)))
        for f in HUMANOID_SOLE_FRAMES
    }
    wbc_dt = config.mpc_dt / config.wbc_per_mpc
    physics_dt = wbc_dt / config.physics_per_wbc

    def fdyn(s, tau, t):
        poses_s = forward_kinematics(
            tree, s.base_position, s.base_rotation, s.joint_positions)
        nu = jnp.concatenate([s.base_twist, s.joint_velocities])
        wr = {}
        for fname, cparams in ground.items():
            R_f, p_f, v_f = rb.frame_kinematics(tree, poses_s, fname, nu)
            R0, p0 = null_poses[fname]
            wr[fname] = contact_wrench(cparams, ContactState(
                position=p_f, rotation=R_f,
                linear_velocity=v_f[:3], angular_velocity=v_f[3:],
                null_position=p0, null_rotation=R0,
            ))
        wr["imu"] = jnp.zeros(6, dtype)
        return rb.floating_base_dynamics(
            tree, s, rb.FloatingBaseInput(joint_torques=tau,
                                          contact_wrenches=wr),
            t, rho=1.0)

    tau0 = jnp.zeros(n, dtype)

    from blf_tpu.ops.integrators import integrate_rosenbrock, rosenbrock_operator

    @jax.jit
    def plant_only(st):
        def one(stt):
            op = rosenbrock_operator(fdyn, stt.plant, u=tau0, dt=physics_dt)
            def body(p, _):
                p2 = integrate_rosenbrock(fdyn, p, dt=physics_dt,
                                          num_steps=config.physics_per_wbc,
                                          u=tau0, operator=op)
                return p2, None
            p, _ = jax.lax.scan(body, stt.plant, None, length=10)
            return p
        return jax.vmap(one)(st)
    results["plant10_s"] = round(timed(plant_only, state), 4)

    @jax.jit
    def op_only(st):
        def one(stt):
            return rosenbrock_operator(fdyn, stt.plant, u=tau0,
                                       dt=physics_dt).sum()
        return jax.vmap(one)(st)
    results["rosop_s"] = round(timed(op_only, state), 4)

    # -- estimator chain x10 -------------------------------------------------
    obs_params = MomentumObserverParams(gain=jnp.asarray(config.observer_gain),
                                        dt=jnp.asarray(wbc_dt))

    @jax.jit
    def est_only(st):
        def one(stt):
            def body(obs, _):
                obs2, residual = momentum_observer_step(
                    tree, obs_params, obs, stt.plant, tau0)
                poses_ = forward_kinematics(
                    tree, stt.plant.base_position, stt.plant.base_rotation,
                    stt.plant.joint_positions)
                nu = jnp.concatenate([stt.plant.base_twist,
                                      stt.plant.joint_velocities])
                tau_known = jnp.zeros(tree.nv, dtype)
                for fname, cparams in ground.items():
                    R_f, p_f, v_f = rb.frame_kinematics(tree, poses_, fname, nu)
                    R0, p0 = null_poses[fname]
                    wr = contact_wrench(cparams, ContactState(
                        position=p_f, rotation=R_f,
                        linear_velocity=v_f[:3], angular_velocity=v_f[3:],
                        null_position=p0, null_rotation=R0))
                    tau_known = tau_known + frame_jacobian(
                        tree, poses_, fname).T @ wr
                wrenches = wrenches_from_residual(
                    tree, stt.plant, ("imu",), residual - tau_known)
                return obs2, wrenches[-1, :2]
            obs, meas = jax.lax.scan(body, stt.observer, None, length=10)
            return meas
        return jax.vmap(one)(st)
    results["est10_s"] = round(timed(est_only, state), 4)

    accounted = (results["mpc_s"] + results["wbc10_s"] + results["plant10_s"]
                 + results["est10_s"])
    results["accounted_s"] = round(accounted, 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
