"""Scaling harness: DCM-MPC fleet throughput at 1 chip / N devices.

BASELINE.json requires "solves/s efficiency measured at 1 chip, 1 host, and
N>=2 hosts". This harness measures the sharded fleet tick (the same program
``bench.py`` times) at every device count 1..D on the attached platform and
reports weak-scaling efficiency (per-device throughput at N devices vs. at
1 device). On this image only ONE real TPU chip is attached, so the N>=2
rows are demonstrated on a virtual CPU mesh (``--virtual N`` sets
``xla_force_host_platform_device_count`` before JAX imports) — the program,
shardings, and collectives are identical to what a v5e-16 pod slice runs;
only the executor changes. Multi-host entry is ``jax.distributed.initialize``
+ the same ``make_fleet_step`` (the mesh then spans hosts and the ``data``
axis rides ICI/DCN).

Usage:
    python bench_scaling.py               # real platform, all device counts
    python bench_scaling.py --virtual 8   # 8 virtual CPU devices (weak scaling)

Prints one JSON line per device count plus a summary line.
"""

import argparse
import json
import os
import sys
import time


def _parse():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (weak-scaling demo)")
    ap.add_argument("--batch-per-device", type=int, default=None,
                    help="scenarios per device (default: 16384 on TPU, "
                         "256 on CPU; 8 in --stack mode)")
    ap.add_argument("--ticks", type=int, default=10)
    ap.add_argument("--iterations", type=int, default=50)
    ap.add_argument("--horizon", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=5,
                    help="timing repeats per device count; the table "
                         "reports the MEDIAN and the min–max spread "
                         "(single samples on a shared-silicon virtual mesh "
                         "scatter ±40% — VERDICT r3 weak #4)")
    ap.add_argument("--stack", action="store_true",
                    help="weak-scale the BASELINE config-4 hierarchical "
                         "stack tick (23-DoF plant + WBC + estimators) "
                         "instead of the DCM-MPC fleet tick")
    return ap.parse_args()


def main():
    args = _parse()
    if args.virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()

    import jax

    if args.virtual:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from blf_tpu.parallel.mesh import make_mesh, shard_batch
    from blf_tpu.parallel.sweep import init_fleet, make_fleet_step
    from __graft_entry__ import _example_problem

    platform = jax.devices()[0].platform
    n_total = len(jax.devices())
    if args.stack:
        per_dev = args.batch_per_device or (256 if platform == "tpu" else 8)
    else:
        per_dev = args.batch_per_device or (16384 if platform == "tpu"
                                            else 256)
    horizon = args.horizon
    dtype = jnp.float32

    counts = sorted({1, 2, 4, n_total} & set(range(1, n_total + 1))) or [1]

    if args.stack:
        _run_stack(args, jax, jnp, np, platform, counts, per_dev)
        return

    rows = []
    for nd in counts:
        mesh = make_mesh(nd, model_axis=1)
        batch = per_dev * nd
        params, dt, _, _, _, _, _ = _example_problem(batch, horizon, dtype)
        stance = jnp.zeros(2, dtype)
        zmp_ref = jnp.broadcast_to(stance, (horizon, 2))
        dcm_ref = jnp.broadcast_to(stance, (horizon + 1, 2))
        poly_A = jnp.tile(
            jnp.asarray([[1.0, 0], [-1.0, 0], [0, 1.0], [0, -1.0]], dtype),
            (horizon, 1, 1),
        )
        poly_b = jnp.broadcast_to(
            jnp.asarray([0.1, 0.1, 0.06, 0.06], dtype), (horizon, 4)
        )
        num_constraints = 2 * horizon + horizon * poly_A.shape[-2]
        state = init_fleet(
            batch, horizon, num_constraints,
            jnp.array([0.01, -0.01], dtype), jnp.array([0.01, -0.01], dtype),
            dtype=dtype,
        )
        state = shard_batch(state, mesh)
        rng = np.random.default_rng(0)
        dist = jnp.asarray(rng.normal(0, 0.004, (batch, 1, 2)), dtype)
        backend = "pallas" if platform == "tpu" else "xla"
        step = make_fleet_step(mesh, params, dt, iterations=args.iterations,
                               backend=backend)

        @jax.jit
        def run_ticks(state):
            def body(s, _):
                s2, res = step.sharded_fn(s, dist, dcm_ref, zmp_ref,
                                          poly_A, poly_b)
                return s2, res

            s, results = jax.lax.scan(body, state, None, length=args.ticks)
            last = jax.tree_util.tree_map(lambda a: a[-1], results)
            return s, last

        state, result = run_ticks(state)          # compile + warm state
        jax.block_until_ready(state.dcm)
        samples = []
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            state, result = run_ticks(state)
            jax.block_until_ready(state.dcm)
            samples.append(time.perf_counter() - t0)
        elapsed = float(np.median(samples))

        tick_ms = elapsed / args.ticks * 1e3
        sps = batch / (elapsed / args.ticks)
        spread = (batch / (min(samples) / args.ticks),
                  batch / (max(samples) / args.ticks))
        rows.append({
            "devices": nd,
            "platform": platform,
            "batch": batch,
            "solves_per_sec": round(sps, 1),
            "solves_per_sec_min": round(min(spread), 1),
            "solves_per_sec_max": round(max(spread), 1),
            "repeats": len(samples),
            "solves_per_sec_per_device": round(sps / nd, 1),
            "tick_ms": round(tick_ms, 2),
            "num_converged": float(result.stats.num_converged),
        })
        print(json.dumps(rows[-1]))
        sys.stdout.flush()

    base = rows[0]["solves_per_sec_per_device"]
    agg0 = rows[0]["solves_per_sec"]
    summary = {
        "metric": "fleet_weak_scaling",
        "platform": platform,
        "device_counts": [r["devices"] for r in rows],
        "per_device_efficiency": [
            round(r["solves_per_sec_per_device"] / base, 3) for r in rows
        ],
        "aggregate_vs_1dev": [
            round(r["solves_per_sec"] / agg0, 3) for r in rows
        ],
    }
    if args.virtual or platform == "cpu":
        # N virtual devices share ONE host's silicon: per-device efficiency
        # cannot exceed 1/N, so the meaningful column is aggregate throughput
        # staying ~flat (collective/partition overhead only). Real pod slices
        # add silicon per device; per_device_efficiency is the metric there.
        summary["note"] = (
            "virtual shared-silicon devices: read aggregate_vs_1dev "
            "(~1.0 = shardings/collectives add no overhead)"
        )
    print(json.dumps(summary))


def _run_stack(args, jax, jnp, np, platform, counts, per_dev):
    """Config-4 stack weak scaling: the FLEET-NATIVE hierarchical stack tick
    (r5 production path — fused kernel backends on TPU, XLA on the virtual
    CPU mesh), data-sharded over the mesh with shard_map (lanes never
    migrate; the tick itself has NO cross-device traffic — pure DP over
    scenarios)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from blf_tpu.models import rigid_body as rb
    from blf_tpu.models.kinematics import forward_kinematics, frame_pose
    from blf_tpu.models.lipm import LIPMParams
    from blf_tpu.models.robots import HUMANOID_SOLE_FRAMES, make_humanoid_23dof
    from blf_tpu.mpc.stack import StackConfig, init_stack, make_fleet_stack_step
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
        base_twist=jnp.zeros(6, dtype), joint_velocities=jnp.zeros(n, dtype),
        base_position=jnp.asarray([0.0, 0.0, -float(p_sole[2])], dtype),
        base_rotation=jnp.eye(3, dtype=dtype), joint_positions=qj)
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
                    dtype) + half, (horizon, 4))
    kernels = platform == "tpu"
    config = StackConfig(mpc_dt=0.1, horizon=horizon, wbc_per_mpc=10,
                         physics_per_wbc=2, plant_method="rosenbrock",
                         mpc_iterations=100, wbc_iterations=150,
                         wbc_check_every=150,
                         wbc_polish_iters=0 if kernels else 25,
                         wbc_scaling_iters=4,
                         mpc_backend="pallas" if kernels else "xla",
                         wbc_backend="pallas" if kernels else "xla",
                         plant_lagged_minv=kernels, ros_op_stiff=kernels)
    null_poses = {}
    for f in HUMANOID_SOLE_FRAMES:
        _, p0 = frame_pose(tree, poses, f)
        null_poses[f] = (jnp.eye(3, dtype=dtype),
                         p0 + jnp.asarray([0.0, 0.0, config.ground_sag],
                                          dtype))
    step = make_fleet_stack_step(tree, wbc, lipm, config, null_poses,
                                 q_ref=plant.joint_positions,
                                 com_height_ref=float(com[2]))
    state0 = init_stack(tree, lipm, config, plant,
                        2 * horizon + horizon * 4)
    ticks = max(1, args.ticks // 5)
    rows = []
    for nd in counts:
        mesh = Mesh(np.array(jax.devices()[:nd]), ("data",))
        batch = per_dev * nd
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state0)
        rng = np.random.default_rng(0)
        pushes = jnp.asarray(rng.uniform(-8.0, 8.0, (batch, 2)), dtype)

        def local_ticks(s, p):
            def body(carry, _):
                s2, tr = step(carry, p, dcm_ref, zmp_ref, poly_A, poly_b)
                return s2, tr.status
            s, statuses = jax.lax.scan(body, s, None, length=ticks)
            return s, statuses[-1]

        run = jax.jit(shard_map(
            local_ticks, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=(P("data"), P("data")), check_vma=False))
        state, status = run(state, pushes)
        jax.block_until_ready(state.plant.base_position)
        samples = []
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            state, status = run(state, pushes)
            jax.block_until_ready(state.plant.base_position)
            samples.append(time.perf_counter() - t0)
        elapsed = float(np.median(samples))
        tps = batch / (elapsed / ticks)
        rows.append({
            "devices": nd, "platform": platform, "batch": batch,
            "stack_ticks_per_sec": round(tps, 2),
            "ticks_per_sec_min": round(batch / (max(samples) / ticks), 2),
            "ticks_per_sec_max": round(batch / (min(samples) / ticks), 2),
            "repeats": len(samples),
            "converged": int(np.sum(np.asarray(status) == 0)),
        })
        print(json.dumps(rows[-1]))
        sys.stdout.flush()
    agg0 = rows[0]["stack_ticks_per_sec"]
    print(json.dumps({
        "metric": "stack_weak_scaling", "platform": platform,
        "device_counts": [r["devices"] for r in rows],
        "aggregate_vs_1dev": [
            round(r["stack_ticks_per_sec"] / agg0, 3) for r in rows],
    }))


if __name__ == "__main__":
    main()
