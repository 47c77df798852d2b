"""Benchmark: batched DCM-MPC throughput on one TPU chip.

Metric: **warm-started DCM-MPC solves per second per chip** on the
push-recovery fleet tick (BASELINE config 5 in miniature: batched QP solve +
fleet reduction + state advance + RLS update, all in one jitted program).

Baseline derivation (BASELINE.json north star): ≥4096 concurrent scenarios
solved *in real time* on a v5e-16 (16 chips) with a 10 Hz replan cycle
⇒ 4096/16 × 10 = **2560 solves/s/chip** is the real-time bar.
``vs_baseline`` = measured / 2560 (≥ 1.0 beats the target).

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from blf_tpu.parallel.mesh import make_mesh, shard_batch
    from blf_tpu.parallel.sweep import init_fleet, make_fleet_step
    from __graft_entry__ import _example_problem

    dtype = jnp.float32
    batch = 98304             # throughput saturates here (96 × 1024 lanes)
    horizon = 32              # production transcription. Promoted from 16 in
    # r4 (VERDICT r3 weak #2): the (m, n) = (192, 128) operator is
    # 128-aligned, so the fused ADMM kernel runs at ≥25% useful MXU (SOL.md)
    # instead of the (96, 64) shape's 11.6% — the headline now measures the
    # EFFICIENT shape, and buys a 3.2 s lookahead at the same 0.1 s knots.
    iterations = 50           # warm-started receding-horizon budget
    replan_hz = 10.0          # 0.1 s control period (real-time definition)
    backend = "pallas"        # fused VMEM-resident ADMM stage kernel
    unroll = 16               # kernel iteration unroll (29.2% MXU at h=32,
    #                           SOL.md tuning sweep; default 8 elsewhere)

    mesh = make_mesh(1, model_axis=1)
    params, dt, _, _, _, _, _ = _example_problem(batch, horizon, dtype)
    # Stationary push-recovery task: time-invariant receding horizon, so the
    # warm-started steady state is the true production workload.
    stance = jnp.zeros(2, dtype)
    zmp_ref = jnp.broadcast_to(stance, (horizon, 2))
    dcm_ref = jnp.broadcast_to(stance, (horizon + 1, 2))
    poly_A = jnp.tile(
        jnp.asarray([[1.0, 0], [-1.0, 0], [0, 1.0], [0, -1.0]], dtype),
        (horizon, 1, 1),
    )
    poly_b = jnp.broadcast_to(jnp.asarray([0.1, 0.1, 0.06, 0.06], dtype),
                              (horizon, 4))
    num_constraints = 2 * horizon + horizon * poly_A.shape[-2]
    state = init_fleet(
        batch, horizon, num_constraints,
        jnp.array([0.01, -0.01], dtype), jnp.array([0.01, -0.01], dtype),
        dtype=dtype,
    )
    state = shard_batch(state, mesh)
    rng = np.random.default_rng(0)
    dist = jnp.asarray(rng.normal(0, 0.004, (batch, 1, 2)), dtype)

    step = make_fleet_step(mesh, params, dt, iterations=iterations,
                           backend=backend, unroll=unroll)

    # The production loop runs many control ticks on-device: scan them inside
    # ONE jit so the measurement is device throughput, not per-call host
    # dispatch latency (the axon tunnel adds ~7 ms per dispatch).
    ticks = 20

    @jax.jit
    def run_ticks(state):
        def body(s, _):
            s2, res = step.sharded_fn(s, dist, dcm_ref, zmp_ref,
                                      poly_A, poly_b)
            return s2, res

        s, results = jax.lax.scan(body, state, None, length=ticks)
        last = jax.tree_util.tree_map(lambda a: a[-1], results)
        return s, last

    # warmup / compile + reach warm-started steady state
    state, result = run_ticks(state)
    jax.block_until_ready(state.dcm)

    t0 = time.perf_counter()
    state, result = run_ticks(state)
    jax.block_until_ready(state.dcm)
    elapsed = time.perf_counter() - t0

    tick_time = elapsed / ticks
    solves_per_sec = batch / tick_time
    realtime_bar = 4096.0 / 16.0 * replan_hz  # 2560 solves/s/chip

    # telemetry + per-lane status ride the production tick (SURVEY.md §5);
    # the stream sinks to stderr so stdout stays the driver's ONE JSON line
    import sys

    from blf_tpu.utils.status import status_counts
    from blf_tpu.utils.telemetry import TelemetryStream

    telemetry = TelemetryStream(sink=sys.stderr, name="bench_fleet")
    record = telemetry.publish({
        "converged": result.stats.num_converged,
        "max_primal_residual": result.stats.max_primal_residual,
        "max_dual_residual": result.stats.max_dual_residual,
        "worst_margin": result.worst_margin,
        "quarantined": result.num_quarantined,
    }, step=2 * ticks)
    counts = status_counts(result.status)

    print(json.dumps({
        "metric": "dcm_mpc_solves_per_sec_per_chip",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_sec / realtime_bar, 3),
        "detail": {
            "batch": batch,
            "horizon_knots": horizon,
            "admm_iterations": iterations,
            "tick_ms": round(tick_time * 1e3, 2),
            "backend": backend,
            "num_converged": float(result.stats.num_converged),
            "max_primal_residual": float(result.stats.max_primal_residual),
            "status_counts": counts,
            "quarantined": float(result.num_quarantined),
            "telemetry_record": {k: v for k, v in record.items()
                                 if k not in ("stream", "time")},
            "device": str(jax.devices()[0]),
            "dtype": "float32",
        },
    }))


if __name__ == "__main__":
    main()
