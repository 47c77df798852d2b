"""Backend × batch throughput sweep for the fleet tick (tuning tool).

Sweeps the warm-started DCM-MPC fleet tick (the `bench.py` workload) over
QP-solver backends and batch sizes, printing one JSON line per config:
``{"backend", "batch", "tick_ms", "solves_per_s", "conv", "rp"}``. Use it to
re-pick `bench.py`'s config when the solver or kernels change.

Measured on the v5e (horizon 16, 50 iterations, f32). Run-to-run spread at
the peak is ~1%; the canonical headline number is the driver-recorded
BENCH_r01.json run (3.66M solves/s at batch 98304, tick 26.88 ms — the
round-3 batch-minor kernel rewrite lifted this to 5.85M at tick 16.8 ms,
2026-08-19) — quoted by README.md and PARITY.md. One sweep @ 2026-08-19:

    backend     batch    tick_ms   solves/s
    xla         16384      6.9     2.37M
    xla         32768     10.3     3.17M     (XLA path peaks here)
    pallas      65536     18.4     3.57M
    pallas      98304     26.8     3.66M     <- bench.py config
    pallas     131072     35.8     3.66M     (saturated)
    pallas_f32  65536     24.2     2.71M     (6-pass f32 MXU products)

``pallas`` = fused VMEM-resident ADMM stage kernel with 3-pass split-f32
matmuls (`blf_tpu/ops/pallas/admm.py`); batch 262144 exceeds the kernel's
scoped-VMEM budget at block_lanes=1024.
"""

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backends", nargs="+",
                    default=["xla", "pallas", "pallas_f32"])
    ap.add_argument("--batches", nargs="+", type=int,
                    default=[16384, 32768, 65536, 98304])
    ap.add_argument("--horizon", type=int, default=16)
    ap.add_argument("--iterations", type=int, default=50)
    ap.add_argument("--ticks", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from blf_tpu.parallel.mesh import make_mesh, shard_batch
    from blf_tpu.parallel.sweep import init_fleet, make_fleet_step
    from __graft_entry__ import _example_problem

    dtype = jnp.float32
    horizon = args.horizon
    for backend in args.backends:
        for batch in args.batches:
            mesh = make_mesh(1, model_axis=1)
            params, dt, _, _, _, _, _ = _example_problem(batch, horizon, dtype)
            stance = jnp.zeros(2, dtype)
            zmp_ref = jnp.broadcast_to(stance, (horizon, 2))
            dcm_ref = jnp.broadcast_to(stance, (horizon + 1, 2))
            poly_A = jnp.tile(
                jnp.asarray([[1.0, 0], [-1.0, 0], [0, 1.0], [0, -1.0]], dtype),
                (horizon, 1, 1))
            poly_b = jnp.broadcast_to(
                jnp.asarray([0.1, 0.1, 0.06, 0.06], dtype), (horizon, 4))
            nc = 2 * horizon + horizon * poly_A.shape[-2]
            state = init_fleet(
                batch, horizon, nc, jnp.array([0.01, -0.01], dtype),
                jnp.array([0.01, -0.01], dtype), dtype=dtype)
            state = shard_batch(state, mesh)
            rng = np.random.default_rng(0)
            dist = jnp.asarray(rng.normal(0, 0.004, (batch, 1, 2)), dtype)
            step = make_fleet_step(mesh, params, dt,
                                   iterations=args.iterations,
                                   backend=backend)
            ticks = args.ticks

            @jax.jit
            def run_ticks(state, step=step, dist=dist, dcm_ref=dcm_ref,
                          zmp_ref=zmp_ref, poly_A=poly_A, poly_b=poly_b):
                def body(s, _):
                    return step.sharded_fn(s, dist, dcm_ref, zmp_ref,
                                           poly_A, poly_b)

                s, results = jax.lax.scan(body, state, None, length=ticks)
                return s, jax.tree_util.tree_map(lambda a: a[-1], results)

            state, result = run_ticks(state)
            jax.block_until_ready(state.dcm)
            t0 = time.perf_counter()
            state, result = run_ticks(state)
            jax.block_until_ready(state.dcm)
            tick = (time.perf_counter() - t0) / ticks
            print(json.dumps({
                "backend": backend, "batch": batch,
                "tick_ms": round(tick * 1e3, 2),
                "solves_per_s": round(batch / tick, 0),
                "conv": float(result.stats.num_converged),
                "rp": float(result.stats.max_primal_residual),
            }), flush=True)


if __name__ == "__main__":
    main()
