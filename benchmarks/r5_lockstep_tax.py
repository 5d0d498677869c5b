"""Quantify the lockstep tax (VERDICT r4 item 4).

The lockstep traversal pays every while-loop iteration for ALL lanes at the
worst live lane's depth (bench scene: max 13 iterations vs mean 7.2).  How
much of the gap between the shipped throughput and the mean-work gather
ceiling is actually recoverable by scheduling?

Experiment: measure per-ray phase-1 iteration counts (with_stats), sort the
batch by them, split into k equal bins, and time each bin's shoot
SEPARATELY — each bin's while_loop then runs only to its own worst lane, so
sum(bin times) is what a perfect two-pass "predict cost, then bucket"
scheduler would achieve (minus its prediction cost, which this experiment
gets for free from an oracle).  Compare against the natural batch and the
sorted-unsplit batch (sanity: sorting alone cannot help a single lockstep
call).  Per-call floors are real and included — that is the point: the tax
is only recoverable net of them.

Run on the chip:  python benchmarks/r5_lockstep_tax.py [n_bins] [log2_rays]
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
from hare_tpu.trace import uniform_sphere


def sync(x):
    return float(np.asarray(x).sum())


def bench(fn, iters=20):
    r = fn()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / iters


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 15)
    faces = shapes.shoebox(20.0, 20.0, 20.0) + shapes.icosphere(
        6, radius=6.0, center=(10.0, 10.0, 10.0)
    )
    top = Topology.build(faces)
    sp = SpatialPartition(top, accel="grid", domain=48)
    d = uniform_sphere(jax.random.PRNGKey(0), n)
    o = jnp.tile(jnp.array([10.0, 10.0, 10.0], jnp.float32), (n, 1)) + 6.5 * d
    rays = Ray.make(o, d)

    _, iters, _, nrows = shoot_grid(
        sp.scene, rays, sp.struct, with_stats=True
    )
    it = np.asarray(iters)
    print(f"iters mean {it.mean():.2f} max {it.max()} "
          f"p50/p90/p99 {np.percentile(it, [50, 90, 99])}")

    t_nat = bench(lambda: shoot_grid(sp.scene, rays, sp.struct).t)
    print(f"natural batch: {t_nat*1e3:.3f} ms ({n/t_nat/1e6:.2f} Mrays/s)")

    order = np.argsort(it, kind="stable")
    rs = Ray(
        jnp.asarray(np.asarray(rays.origin)[order]),
        jnp.asarray(np.asarray(rays.direction)[order]),
        jnp.asarray(np.asarray(rays.exclude_poly)[order]),
    )
    t_sorted = bench(lambda: shoot_grid(sp.scene, rs, sp.struct).t)
    print(f"sorted batch (one call): {t_sorted*1e3:.3f} ms "
          f"(sanity: lockstep cannot profit from order alone)")

    m = n // k
    total = 0.0
    for b in range(k):
        sl = slice(b * m, (b + 1) * m)
        rb = Ray(rs.origin[sl], rs.direction[sl], rs.exclude_poly[sl])
        tb = bench(lambda rb=rb: shoot_grid(sp.scene, rb, sp.struct).t)
        lo, hi = it[order][b * m], it[order][min((b + 1) * m, n) - 1]
        print(f"  bin {b}: iters [{lo},{hi}]  {tb*1e3:.3f} ms")
        total += tb
    print(f"oracle-binned total ({k} bins): {total*1e3:.3f} ms -> "
          f"recoverable lockstep tax = {(t_nat-total)/t_nat*100:.1f}% "
          f"of the natural shoot")


if __name__ == "__main__":
    main()
