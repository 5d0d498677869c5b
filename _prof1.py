import time, json
import numpy as np
import jax, jax.numpy as jnp
from hare_tpu.geom import Ray
from hare_tpu.accel import SpatialPartition
from hare_tpu.mesh import Topology, shapes
from hare_tpu.trace import energy_histogram, trace_rays, uniform_sphere

faces = shapes.shoebox(20.0, 20.0, 20.0) + shapes.icosphere(6, radius=6.0, center=(10.0,10.0,10.0))
top = Topology.build(faces)
sp = SpatialPartition(top, accel="grid", domain=48)
shoot_fn = sp.shoot_fn
n_bounces = 3
a = jnp.full(top.n_polys, 0.3, jnp.float32)

def make_rays(n):
    key = jax.random.PRNGKey(0)
    d = uniform_sphere(key, n)
    o = jnp.tile(jnp.array([10.0,10.0,10.0], jnp.float32), (n,1)) + 6.5*d
    return Ray.make(o, d)

def loss(scene, a_, rays_, aux):
    res = trace_rays(scene, rays_, a_, n_bounces, shoot_fn, aux=aux)
    h = energy_histogram(res, n_bins=512, bin_dt=1e-3)
    return jnp.sum(h)

fwd = jax.jit(loss)
vg = jax.jit(jax.value_and_grad(loss, argnums=1))

for n in (1<<15, 1<<16, 1<<17, 1<<18):
    rays = make_rays(n)
    _ = float(fwd(sp.scene, a, rays, sp.aux))
    t0=time.perf_counter()
    for _ in range(10): v = fwd(sp.scene, a, rays, sp.aux)
    _ = float(v)
    tf=(time.perf_counter()-t0)/10
    v,g = vg(sp.scene, a, rays, sp.aux); _=float(v)+float(jnp.sum(g))
    t0=time.perf_counter()
    for _ in range(10): v,g = vg(sp.scene, a, rays, sp.aux)
    _=float(v)+float(jnp.sum(g))
    tg=(time.perf_counter()-t0)/10
    print(json.dumps({"n":n,"fwd_ms":round(tf*1e3,2),"fwdbwd_ms":round(tg*1e3,2),
        "fwd_Mrays":round(n*n_bounces/tf/1e6,3),"fwdbwd_Mrays":round(n*n_bounces/tg/1e6,3)}))
