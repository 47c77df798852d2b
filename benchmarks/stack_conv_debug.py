"""Convergence diagnosis for the config-4 stack at the bench operating
point (f32, small batch, CPU or TPU): per-tick WBC residual distribution
under different solver knob settings.

Run: python benchmarks/stack_conv_debug.py [batch] [ticks]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main(batch=32, ticks=5):
    import jax
    if jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from blf_tpu.models import rigid_body as rb
    from blf_tpu.models.kinematics import forward_kinematics, frame_pose
    from blf_tpu.models.lipm import LIPMParams
    from blf_tpu.models.robots import HUMANOID_SOLE_FRAMES, make_humanoid_23dof
    from blf_tpu.mpc.stack import StackConfig, init_stack, make_stack_step
    from blf_tpu.mpc.wholebody import WholeBodyParams

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
    null_poses = {}
    for f in HUMANOID_SOLE_FRAMES:
        _, p0 = frame_pose(tree, poses, f)
        null_poses[f] = (jnp.eye(3, dtype=dtype),
                         p0 + jnp.asarray([0.0, 0.0, 2e-3], dtype))

    rng = np.random.default_rng(0)
    pushes = jnp.asarray(rng.uniform(-8.0, 8.0, (batch, 2)), dtype)

    variants = {
        "bench(it100,pol25)": dict(wbc_iterations=100, wbc_polish_iters=25),
        "nopolish(it125)": dict(wbc_iterations=125, wbc_polish_iters=0),
        "it150,pol25": dict(wbc_iterations=150, wbc_polish_iters=25),
        "it200,pol25": dict(wbc_iterations=200, wbc_polish_iters=25),
        "it250,pol0": dict(wbc_iterations=250, wbc_polish_iters=0),
        "it250,pol25": dict(wbc_iterations=250, wbc_polish_iters=25),
    }
    only = sys.argv[3] if len(sys.argv) > 3 else None
    for name, kw in variants.items():
        if only and only not in name:
            continue
        kw.setdefault("wbc_check_every", 25)
        config = StackConfig(mpc_dt=0.1, horizon=horizon, wbc_per_mpc=10,
                             physics_per_wbc=4, plant_method="rosenbrock",
                             mpc_iterations=100, **kw)
        step = make_stack_step(tree, wbc, lipm, config, null_poses,
                               q_ref=plant.joint_positions,
                               com_height_ref=float(com[2]))
        state0 = init_stack(tree, lipm, config, plant,
                            2 * horizon + horizon * 4)
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state0)
        vstep = jax.jit(jax.vmap(
            lambda st, p: step(st, p, dcm_ref, zmp_ref, poly_A, poly_b)))
        rows = []
        import time as _time
        for t in range(ticks):
            _t0 = _time.perf_counter()
            state, tr = vstep(state, pushes)
            jax.block_until_ready(tr.dcm)
            _dt = _time.perf_counter() - _t0
            rp = np.asarray(tr.wbc_max_rp)
            tilt = np.asarray(state.plant.base_rotation[:, 2, 2])
            qv = np.abs(np.asarray(state.plant.joint_velocities)).max(axis=1)
            dcm_err = np.abs(np.asarray(tr.dcm) - np.asarray(stance)).max(1)
            est_err = np.abs(np.asarray(state.push_theta)
                             - np.asarray(pushes)).max(1)
            rows.append((t, _dt, float(np.median(rp)), float(rp.max()),
                         int(np.asarray(tr.wbc_converged).sum()),
                         int(np.asarray(tr.mpc_converged).sum()),
                         float(tilt.min()), float(qv.max()),
                         float(np.median(dcm_err)), float(dcm_err.max()),
                         float(np.median(est_err)), float(est_err.max())))
        print(f"== {name}")
        for r in rows:
            print("  t%02d %5.2fs med_rp %.1e max_rp %.1e conv %d/%d mpc %d "
                  "tilt_min %.3f qv_max %.1f dcm med/max %.3f/%.3f "
                  "est med/max %.1f/%.1f" % ((r[0], r[1], r[2], r[3], r[4],
                                              batch) + tuple(r[5:])))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         int(sys.argv[2]) if len(sys.argv) > 2 else 5)
