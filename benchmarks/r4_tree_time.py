import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import time, numpy as np, jax, jax.numpy as jnp
from hare_tpu.geom import Ray
from hare_tpu.accel import SpatialPartition
from hare_tpu.accel.tree import shoot_tree
from hare_tpu.mesh import Topology, shapes
from hare_tpu.trace import uniform_sphere

faces = shapes.shoebox(20.0,20.0,20.0) + shapes.icosphere(6, radius=6.0, center=(10.,10.,10.))
top = Topology.build(faces)
n = 1 << 15
d = uniform_sphere(jax.random.PRNGKey(0), n)
o = jnp.tile(jnp.array([10.,10.,10.], jnp.float32), (n,1)) + 6.5*d
rays = Ray.make(o, d)
def timeit(f, iters=20):
    r = f(); float(np.asarray(r).sum())
    t0 = time.perf_counter()
    for _ in range(iters): r = f()
    float(np.asarray(r).sum())
    return (time.perf_counter()-t0)/iters
import sys as _sys
cfgs = [("kdtree", {"levels": 2}), ("kdtree", {"levels": 1})] if "kd" in _sys.argv else [("octree", {}), ("kdtree", {})]
for accel, kw in cfgs:
    t0=time.time()
    sp = SpatialPartition(top, accel=accel, **kw)
    print(accel, kw, "build", round(time.time()-t0,1), "s  branch", sp.struct.branch, "max_node_need", sp.struct.max_node_need, "n_nodes", sp.struct.n_nodes, flush=True)
    dt = timeit(lambda: sp.shoot(rays).t)
    _, iters = shoot_tree(sp.scene, rays, sp.struct, with_stats=True)
    it = np.asarray(iters)
    print(f"{accel}: {dt*1e3:.2f} ms ({n/dt/1e6:.2f} Mrays/s)  pops mean {it.mean():.1f} max {it.max()}", flush=True)
    if accel == "octree":
        # The documented >4-push perf cliff (VERDICT r3 weak item 4): an
        # axis-aligned batch whose rays ride split planes through box
        # centers forces the rare lax.cond overflow push arm every step.
        oa = jnp.tile(jnp.array([10.0, 10.0, -5.0], jnp.float32), (n, 1))
        da = jnp.tile(jnp.array([0.0, 0.0, 1.0], jnp.float32), (n, 1))
        dta = timeit(lambda: sp.shoot(Ray.make(oa, da)).t)
        print(f"octree axis-aligned-through-centers batch: {dta*1e3:.2f} ms "
              f"({dta/dt:.2f}x the random batch)", flush=True)
