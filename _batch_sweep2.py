import time, json
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from blf_tpu.parallel.mesh import make_mesh, shard_batch
from blf_tpu.parallel.sweep import init_fleet, make_fleet_step
from __graft_entry__ import _example_problem

dtype = jnp.float32
horizon = 16
iterations = 50
for backend in ("pallas", "pallas_f32"):
  for batch in (16384, 32768, 65536):
    mesh = make_mesh(1, model_axis=1)
    params, dt, _, _, _, _, _ = _example_problem(batch, horizon, dtype)
    stance = jnp.zeros(2, dtype)
    zmp_ref = jnp.broadcast_to(stance, (horizon, 2))
    dcm_ref = jnp.broadcast_to(stance, (horizon + 1, 2))
    poly_A = jnp.tile(jnp.asarray([[1.0,0],[-1.0,0],[0,1.0],[0,-1.0]], dtype), (horizon,1,1))
    poly_b = jnp.broadcast_to(jnp.asarray([0.1,0.1,0.06,0.06], dtype), (horizon,4))
    nc = 2*horizon + horizon*poly_A.shape[-2]
    state = init_fleet(batch, horizon, nc, jnp.array([0.01,-0.01],dtype), jnp.array([0.01,-0.01],dtype), dtype=dtype)
    state = shard_batch(state, mesh)
    rng = np.random.default_rng(0)
    dist = jnp.asarray(rng.normal(0,0.004,(batch,1,2)), dtype)
    step = make_fleet_step(mesh, params, dt, iterations=iterations, backend=backend)
    ticks = 20
    @jax.jit
    def run_ticks(state):
        def body(s,_):
            s2,res = step.sharded_fn(s,dist,dcm_ref,zmp_ref,poly_A,poly_b)
            return s2,res
        s,results = jax.lax.scan(body,state,None,length=ticks)
        return s, jax.tree_util.tree_map(lambda a:a[-1],results)
    state,result = run_ticks(state); jax.block_until_ready(state.dcm)
    t0=time.perf_counter(); state,result=run_ticks(state); jax.block_until_ready(state.dcm)
    el=time.perf_counter()-t0
    tick=el/ticks
    print(json.dumps({"backend":backend,"batch":batch,"tick_ms":round(tick*1e3,2),
                      "solves_per_s":round(batch/tick,0),
                      "conv":float(result.stats.num_converged),
                      "rp":float(result.stats.max_primal_residual)}), flush=True)
