"""Rigid-foot contact rollout throughput: XLA scan vs fused Pallas kernel.

Measures lane-steps/s (one lane-step = one Euler step of one scenario) for
the BASELINE config-2 workload at Monte-Carlo scale, plus the SOL account
for both paths. Run on the real TPU:

    PYTHONPATH=. python benchmarks/rollout_bench.py [--batch 65536] [--steps 1000]
"""

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--block", type=int, default=512)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    from blf_tpu.models.contact import ContactParams
    from blf_tpu.models.foot import FootParams, FootState, foot_rollout
    from blf_tpu.ops.lie import so3_exp

    dtype = jnp.float32
    B, steps = args.batch, args.steps
    cparams = ContactParams(
        length=jnp.asarray(0.2, dtype), width=jnp.asarray(0.1, dtype),
        spring_coeff=jnp.asarray(2e5, dtype),
        damper_coeff=jnp.asarray(2e3, dtype),
    )
    fparams = FootParams(
        mass=jnp.asarray(0.75, dtype),
        inertia=jnp.asarray([2e-3, 4e-3, 5e-3], dtype),
        baumgarte_rho=jnp.asarray(10.0, dtype),
    )
    rng = np.random.default_rng(0)
    state = FootState(
        position=jnp.asarray(rng.normal(0, 1e-3, (B, 3)), dtype),
        rotation=so3_exp(jnp.asarray(rng.normal(0, 0.02, (B, 3)), dtype)),
        linear_velocity=jnp.asarray(rng.normal(0, 0.05, (B, 3)), dtype),
        angular_velocity=jnp.asarray(rng.normal(0, 0.05, (B, 3)), dtype),
    )
    p0 = jnp.zeros((B, 3), dtype)
    R0 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3))

    for backend in ("xla", "pallas"):
        fn = jax.jit(lambda s, be=backend: foot_rollout(
            cparams, fparams, s, p0, R0, dt=1e-3, steps=steps,
            backend=be, block_lanes=args.block,
        ))
        out = fn(state)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(state)
        jax.block_until_ready(out)
        dt_s = time.perf_counter() - t0
        print(json.dumps({
            "backend": backend, "batch": B, "steps": steps,
            "time_ms": round(dt_s * 1e3, 2),
            "lane_steps_per_s": round(B * steps / dt_s, 0),
            "final_pz_mean": float(out.position[:, 2].mean()),
        }), flush=True)


if __name__ == "__main__":
    main()
