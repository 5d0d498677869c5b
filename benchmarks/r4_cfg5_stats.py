"""Config-5 pathology hunt: traversal stats + phase timing at scale."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from configs import big_scene
from hare_tpu.geom import Ray
from hare_tpu.accel import SpatialPartition
from hare_tpu.accel.voxel import shoot_grid
from hare_tpu.mesh import Topology
from hare_tpu.trace import uniform_sphere

dom = int(sys.argv[1]) if len(sys.argv) > 1 else 256
nlog2 = int(sys.argv[2]) if len(sys.argv) > 2 else 18
top = Topology.build(big_scene("5M"))
t0 = time.time()
sp = SpatialPartition(top, accel="grid", domain=dom)
print("build", round(time.time()-t0,1), "s  max_cell_wins", sp.struct.max_cell_wins,
      "n_wins", sp.struct.win_data.shape[0]-1, flush=True)
n = 1 << nlog2
d = uniform_sphere(jax.random.PRNGKey(0), n)
o = jnp.tile(jnp.array([20.0, 20.0, 20.0], jnp.float32), (n, 1))
rays = Ray.make(o, d)
_, it, rnd, nr = shoot_grid(sp.scene, rays, sp.struct, with_stats=True)
it, nr = np.asarray(it), np.asarray(nr)
print(f"domain={dom} n={n}: iters mean {it.mean():.1f} p99 {np.percentile(it,99):.0f} max {it.max()}  "
      f"rows mean {nr.mean():.2f} p99 {np.percentile(nr,99):.0f} max {nr.max()}  rounds {np.asarray(rnd)}", flush=True)
def timeit(f, iters=5):
    r = f(); float(np.asarray(r).sum())
    t0 = time.perf_counter()
    for _ in range(iters): r = f()
    float(np.asarray(r).sum())
    return (time.perf_counter()-t0)/iters
dt = timeit(lambda: shoot_grid(sp.scene, rays, sp.struct).t)
print(f"raw shoot: {dt*1e3:.1f} ms ({n/dt/1e6:.2f} Mrays/s)", flush=True)
