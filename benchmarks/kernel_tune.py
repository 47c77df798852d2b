"""Tune the fused ADMM stage kernel: block_lanes × matmul-mode sweep.

Times ONE 50-iteration stage call on the bench problem's shapes
(B=98304, n=64, m=96) directly against :func:`blf_tpu.ops.pallas.admm
.admm_stage`, chained ticks inside one jit to amortize dispatch. Prints a
table; run on the real TPU.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from blf_tpu.ops.pallas.admm import admm_stage

    B, n, m = 98304, 64, 96
    iters = 50
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    G2 = jnp.asarray(rng.normal(0, 0.3, (m, n)), dtype)
    d = jnp.asarray(rng.uniform(0.1, 10.0, (n,)), dtype)
    base_rho = jnp.asarray(np.where(rng.uniform(size=m) < 0.3, 30.0, 1.0), dtype)
    v = jnp.asarray(rng.normal(0, 0.1, (B, m)), dtype)
    tau = jnp.zeros((B, n), dtype)
    s = jnp.ones((B, 1), dtype)
    gq = jnp.asarray(rng.normal(0, 0.1, (B, n)), dtype)
    l = jnp.full((B, m), -0.2, dtype)
    u = jnp.full((B, m), 0.2, dtype)

    import sys

    reps = 10
    configs = [("split", 512), ("split", 1024), ("split", 2048),
               ("f32", 1024)]
    if len(sys.argv) > 1:  # e.g. "split:4096,f32:2048"
        configs = [(mm, int(bl)) for mm, bl in
                   (c.split(":") for c in sys.argv[1].split(","))]
    for matmul, bl in configs:
        if True:
            def run(v, tau, *, _bl=bl, _mm=matmul):
                def body(carry, _):
                    v, tau = carry
                    v, tau = admm_stage(
                        v, tau, s, gq, l, u, G2, d, base_rho,
                        iters=iters, alpha=1.6, matmul=_mm, block_lanes=_bl,
                    )
                    return (v, tau), None
                (v, tau), _ = jax.lax.scan(body, (v, tau), None, length=reps)
                return v, tau

            fn = jax.jit(run)
            out = fn(v, tau)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = fn(v, tau)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps
            lanes_per_s = B / dt
            print(f"matmul={matmul:5s} block={bl:5d}: "
                  f"{dt*1e3:7.2f} ms/stage ({iters} iters) "
                  f"{lanes_per_s/1e6:6.2f} M lane-stages/s")


if __name__ == "__main__":
    main()
