"""Phase attribution for eval configs 3 and 4 (VERDICT r4 item 6).

Config 3 (concert hall 1,608 tris, octree, 1M rays x 3 bounces,
fwd+bwd absorption) ran at 0.96 Mrays/s in r4; config 4 (655k tris,
KD-tree depth 20, 32k rays x 2 bounces, vertex grads) at 0.146 — neither
ever got the phase split the grid got in r4.  This measures, per config:
raw per-bounce shoots, fwd trace, fwd+bwd trace, and traversal stats, so
the top cost is identified rather than guessed.

Run:  python benchmarks/r5_cfg34_attrib.py [3|4]
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
from hare_tpu.mesh import Topology, shapes
from hare_tpu.trace import energy_histogram, trace_rays, uniform_sphere


def sync(x):
    return float(np.asarray(x).sum())


def bench(fn, iters=5):
    r = fn()
    sync(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    sync(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / iters


def bounce_batches(sp, rays, a, B):
    """Replay the trace to capture each bounce's actual ray batch."""
    res = trace_rays(sp.scene, rays, a, B, sp.shoot_fn, aux=sp.aux)
    outs = [rays]
    o, d = rays.origin, rays.direction
    for b in range(B - 1):
        hitp = res.point[b]
        # reflected dirs are irrelevant for cost shape; reuse stored points
        # with fresh directions from the trace state is complex — approximate
        # bounce-b batch: origins at bounce-b hit points, directions to next
        # hit points (or reflected): use next point - point normalized.
        nxt = res.point[b + 1] if b + 1 < B else res.point[b]
        dd = nxt - hitp
        nn = jnp.linalg.norm(dd, axis=-1, keepdims=True)
        dd = jnp.where(nn > 1e-6, dd / jnp.maximum(nn, 1e-6), d)
        ex = jnp.stack(
            [res.poly_id[b], jnp.full_like(res.poly_id[b], -1)], axis=-1
        )
        outs.append(Ray(hitp, dd, ex))
    return outs


def attrib(sp, rays, a, B, n, with_vertex_grads=False, iters=5):
    shoot_fn = sp.shoot_fn

    for bi, rb in enumerate(bounce_batches(sp, rays, a, B)):
        dt = bench(lambda rb=rb: shoot_fn(sp.scene, rb, sp.aux).t, iters)
        print(f"  raw shoot bounce-{bi} batch: {dt*1e3:8.2f} ms "
              f"({n/dt/1e6:.2f} Mrays/s)")

    def fwd():
        res = trace_rays(sp.scene, rays, a, B, shoot_fn, aux=sp.aux)
        return energy_histogram(res, 512, 1e-3)

    dt_f = bench(fwd, iters)
    print(f"  fwd {B}-bounce trace: {dt_f*1e3:8.2f} ms "
          f"({n*B/dt_f/1e6:.2f} Mrays/s)")

    if with_vertex_grads:
        def loss_v(verts, rays_, aux):
            sc = sp.scene.with_vertices(verts)
            res = trace_rays(sc, rays_, a, B, shoot_fn, aux=aux)
            return jnp.sum(energy_histogram(res, 512, 1e-3))
        vg = jax.jit(jax.value_and_grad(loss_v))
        dt_b = bench(lambda: vg(sp.scene.vertices, rays, sp.aux)[1], iters)
        print(f"  fwd+bwd(vertices):    {dt_b*1e3:8.2f} ms "
              f"({n*B/dt_b/1e6:.2f} Mrays/s, bwd/fwd {dt_b/dt_f:.2f})")
    else:
        def loss_a(a_, rays_, aux):
            res = trace_rays(sp.scene, rays_, a_, B, shoot_fn, aux=aux)
            return jnp.sum(energy_histogram(res, 512, 1e-3))
        vg = jax.jit(jax.value_and_grad(loss_a))
        dt_b = bench(lambda: vg(a, rays, sp.aux)[1], iters)
        print(f"  fwd+bwd(absorption):  {dt_b*1e3:8.2f} ms "
              f"({n*B/dt_b/1e6:.2f} Mrays/s, bwd/fwd {dt_b/dt_f:.2f})")


def main(which):
    dev = str(jax.devices()[0])
    if which == "3":
        top = Topology.build(shapes.concert_hall())
        sp = SpatialPartition(top, accel="octree")
        n, B = 1_000_000, 3
        d = uniform_sphere(jax.random.PRNGKey(0), n)
        o = jnp.tile(jnp.array([15.0, 24.0, 8.0], jnp.float32), (n, 1))
        a = jnp.full(top.n_polys, 0.3, jnp.float32)
        print(f"config 3: {top.n_tris} tris octree, {n} rays x {B} [{dev}]")
        attrib(sp, Ray.make(o, d), a, B, n, iters=3)
        from hare_tpu.accel import shoot_octree
        stats = shoot_octree(
            sp.scene, Ray.make(o, d), sp.struct, with_stats=True
        )
        p = np.asarray(stats[1])
        print(f"  octree pops mean {p.mean():.1f} max {p.max()}")
    elif which == "4":
        from benchmarks.configs import big_scene
        t0 = time.time()
        top = Topology.build(big_scene("650k"))
        print(f"topo build {time.time()-t0:.0f}s")
        t0 = time.time()
        sp = SpatialPartition(top, accel="kdtree", max_depth=20,
                              max_tris_per_node=16)
        print(f"kd build {time.time()-t0:.0f}s")
        n, B = 1 << 15, 2
        d = uniform_sphere(jax.random.PRNGKey(0), n)
        o = jnp.tile(jnp.array([20.0, 20.0, 20.0], jnp.float32), (n, 1))
        a = jnp.full(top.n_polys, 0.3, jnp.float32)
        dev = str(jax.devices()[0])
        print(f"config 4: {top.n_tris} tris kdtree, {n} rays x {B} [{dev}]")
        attrib(sp, Ray.make(o, d), a, B, n, with_vertex_grads=True, iters=3)
        from hare_tpu.accel import shoot_kdtree
        stats = shoot_kdtree(
            sp.scene, Ray.make(o, d), sp.struct, with_stats=True
        )
        p = np.asarray(stats[1])
        print(f"  kd pops mean {p.mean():.1f} max {p.max()}")
    else:
        raise SystemExit("pass 3 or 4")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "3")
