"""Config-5 scene at 128^3 (grid-resolution tradeoff vs the 256^3 row)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from configs import big_scene, timeit, emit
from hare_tpu.geom import Ray
from hare_tpu.accel import SpatialPartition
from hare_tpu.mesh import Topology
from hare_tpu.trace import energy_histogram, trace_rays, uniform_sphere

t0 = time.time(); top = Topology.build(big_scene("5M")); t_topo = time.time() - t0
t0 = time.time(); sp = SpatialPartition(top, accel="grid", domain=128, win=32, cap=8); t_accel = time.time() - t0
n, B = 1 << 20, 2
d = uniform_sphere(jax.random.PRNGKey(0), n)
o = jnp.tile(jnp.array([20.0, 20.0, 20.0], jnp.float32), (n, 1))
rays = Ray.make(o, d)
a = jnp.full(top.n_polys, 0.3, jnp.float32)
shoot_fn = sp.shoot_fn  # hoist: property returns a fresh closure (recompile per call otherwise)
def run():
    res = trace_rays(sp.scene, rays, a, B, shoot_fn, aux=sp.aux)
    return energy_histogram(res, 1024, 1e-3)
dt = timeit(run, iters=3)
g = sp.struct
emit("5@128", "Mrays/s fwd (config-5 scene, 128^3)", n * B / dt / 1e6, "Mrays/s",
     {"tris": top.n_tris, "rays": n, "grid_dims": g.dims,
      "topo_build_s": round(t_topo, 1), "accel_build_s": round(t_accel, 1),
      "win_data_MB": round(g.win_data.nbytes / 1e6),
      "dup_slots_per_tri": round((g.win_data.shape[0] - 1) * (g.win_data.shape[1] // 12) / top.n_tris, 2),
      "max_cell_wins": g.max_cell_wins, "device": str(jax.devices()[0])})
