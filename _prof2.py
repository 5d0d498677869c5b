import time, json
import numpy as np
import jax, jax.numpy as jnp
from hare_tpu.geom import Ray
from hare_tpu.accel import SpatialPartition
from hare_tpu.accel.voxel import shoot_grid
from hare_tpu.mesh import Topology, shapes
from hare_tpu.trace import uniform_sphere

faces = shapes.shoebox(20.0, 20.0, 20.0) + shapes.icosphere(6, radius=6.0, center=(10.0,10.0,10.0))
top = Topology.build(faces)
n = 1<<15
key = jax.random.PRNGKey(0)
d = uniform_sphere(key, n)
o = jnp.tile(jnp.array([10.0,10.0,10.0], jnp.float32), (n,1)) + 6.5*d
rays = Ray.make(o, d)

for domain in (32, 48, 64, 96):
    sp = SpatialPartition(top, accel="grid", domain=domain)
    g = sp.struct
    counts_occ = None
    hits, iters, rounds = shoot_grid(sp.scene, rays, g, with_stats=True)
    it = np.asarray(iters); rd = int(rounds)
    # time a single shoot
    f = jax.jit(lambda s, r, gr: shoot_grid(s, r, gr).t)
    _ = float(jnp.sum(f(sp.scene, rays, g)))
    t0=time.perf_counter()
    for _ in range(10): t = f(sp.scene, rays, g)
    _=float(jnp.sum(t))
    dt=(time.perf_counter()-t0)/10
    print(json.dumps({"domain":domain,"max_cell_wins":g.max_cell_wins,
        "n_windows":int(g.win_data.shape[0]-1),
        "iters_mean":round(float(it.mean()),1),"iters_max":int(it.max()),
        "rounds":rd,"shoot_ms":round(dt*1e3,2),
        "Mrays":round(n/dt/1e6,3)}))
