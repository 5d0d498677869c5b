"""R4 trace-step attribution: what costs the ~19 ms/step that is not raw
traversal? (VERDICT r3 item 2.)

Method: run the real 3-bounce trace once, capture each bounce's actual ray
batch (origins/directions/exclusions), then time
  - shoot_grid alone on each bounce's rays (the honest per-bounce shoots,
    including bounce-2/3 incoherence),
  - the full fwd trace step,
  - finalize-free vs full shoot (the differentiable recompute),
  - energy_histogram alone.

Target (VERDICT): fwd 3-bounce step <= 1.3x the sum of its raw shoots.

Run: python benchmarks/r4_trace_attrib.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from hare_tpu.geom import Ray
from hare_tpu.accel import SpatialPartition
from hare_tpu.accel.voxel import shoot_grid
from hare_tpu.mesh import Topology, shapes
from hare_tpu.trace import energy_histogram, trace_rays, uniform_sphere


def sync(x):
    return float(np.asarray(x).sum())


def timeit(fn, iters=20):
    r = fn()
    sync(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    sync(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / iters


def main():
    faces = shapes.shoebox(20.0, 20.0, 20.0) + shapes.icosphere(
        6, radius=6.0, center=(10.0, 10.0, 10.0)
    )
    top = Topology.build(faces)
    sp = SpatialPartition(top, accel="grid", domain=48)
    n = 1 << 15
    n_bounces = 3
    key = jax.random.PRNGKey(0)
    d = uniform_sphere(key, n)
    o = jnp.tile(jnp.array([10.0, 10.0, 10.0], jnp.float32), (n, 1)) + 6.5 * d
    rays = Ray.make(o, d)
    a = jnp.full(top.n_polys, 0.3, jnp.float32)

    # ---- capture each bounce's actual ray batch from a real trace
    res = trace_rays(sp.scene, rays, a, n_bounces, sp.shoot_fn, aux=sp.aux)
    from hare_tpu.geom.math import normalize
    from hare_tpu.trace.bounce import reflect
    bounce_rays = [rays]
    origin, direction = rays.origin, normalize(rays.direction)
    for b in range(n_bounces - 1):
        hitb = np.asarray(res.hit[b])
        pt = res.point[b]
        # reconstruct next-bounce directions the way the loop does
        tri = jnp.maximum(
            jnp.asarray(np.asarray(res.poly_id[b])) * 0, 0
        )  # poly->normal needs scene; use finalize outputs instead
        hr_prev = jax.tree.map(jnp.asarray, res)
        # recompute normal from the hit polygons via one shoot (simpler:
        # re-shoot the previous batch and reflect)
        hr = shoot_grid(sp.scene, bounce_rays[-1], sp.struct)
        v = sp.scene.vertices
        meta = sp.scene.tri_meta[jnp.maximum(hr.tri_id, 0)]
        iv = meta[:, 4:7]
        e1 = v[iv[:, 1]] - v[iv[:, 0]]
        e2 = v[iv[:, 2]] - v[iv[:, 0]]
        n_hat = normalize(jnp.cross(e1, e2))
        direction = jnp.where(
            hr.hit[:, None], reflect(direction, n_hat), direction
        )
        origin = jnp.where(hr.hit[:, None], hr.point, origin)
        exclude = jnp.stack(
            [jnp.where(hr.hit, hr.poly_id, -9), jnp.full((n,), -9)], axis=-1
        )
        bounce_rays.append(Ray(origin, direction, exclude.astype(jnp.int32)))

    # ---- per-bounce raw shoots (+ knob variants on incoherent batches)
    tot = 0.0
    for b, rb in enumerate(bounce_rays):
        _, it, rnd, nr = shoot_grid(
            sp.scene, rb, sp.struct, with_stats=True
        )
        it, nr = np.asarray(it), np.asarray(nr)
        dt = timeit(lambda rb=rb: shoot_grid(sp.scene, rb, sp.struct).t)
        tot += dt
        print(
            f"raw shoot bounce {b}: {dt*1e3:.2f} ms  iters mean "
            f"{it.mean():.1f} max {it.max()}  rows mean {nr.mean():.2f} "
            f"max {nr.max()}  rounds {np.asarray(rnd)}"
        )
        if b > 0:
            for kw in ({"soft": 2}, {"soft": 3}, {"cap": 16}):
                dtv = timeit(
                    lambda rb=rb, kw=kw: shoot_grid(
                        sp.scene, rb, sp.struct, **kw
                    ).t
                )
                print(f"  bounce {b} variant {kw}: {dtv*1e3:.2f} ms")
    print(f"sum of raw shoots: {tot*1e3:.2f} ms")

    # ---- full fwd trace step
    def fwd(scene, a_, rays_, aux):
        res = trace_rays(scene, rays_, a_, n_bounces, sp.shoot_fn, aux=aux)
        return energy_histogram(res, 1024, 1e-3)

    jf = jax.jit(fwd)
    dt_full = timeit(lambda: jf(sp.scene, a, rays, sp.aux))
    print(
        f"full fwd trace step: {dt_full*1e3:.2f} ms "
        f"(= {dt_full/tot:.2f}x sum of raw shoots)"
    )

    # ---- trace without histogram
    def fwd_nohist(scene, a_, rays_, aux):
        res = trace_rays(scene, rays_, a_, n_bounces, sp.shoot_fn, aux=aux)
        return res.energy

    dt_nh = timeit(
        lambda: jax.jit(fwd_nohist)(sp.scene, a, rays, sp.aux)
    )
    print(f"trace w/o histogram: {dt_nh*1e3:.2f} ms (hist = {(dt_full-dt_nh)*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
