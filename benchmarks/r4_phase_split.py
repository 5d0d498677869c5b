"""Phase split for the current best grid config (win=32, cap=8):
collect / test / finalize measured separately on the chip.

Run: python benchmarks/r4_phase_split.py
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
from hare_tpu.accel.common import test_windows, finalize_hits
from hare_tpu.accel.voxel import shoot_grid
from hare_tpu.mesh import Topology, shapes
from hare_tpu.trace import uniform_sphere


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
    sp = SpatialPartition(top, accel="grid", domain=48, win=32)
    grid = sp.struct
    n = 1 << 15
    key = jax.random.PRNGKey(0)
    d = uniform_sphere(key, n)
    o = jnp.tile(jnp.array([10.0, 10.0, 10.0], jnp.float32), (n, 1)) + 6.5 * d
    rays = Ray.make(o, d)

    dt_full = timeit(lambda: shoot_grid(sp.scene, rays, grid, cap=8).t)
    print(f"full shoot win32 cap8: {dt_full*1e3:.2f} ms")

    # ---- test_windows on a realistic win32 buffer (mean 1.91 rows, max 5)
    nw = grid.win_data.shape[0] - 1
    rng = np.random.default_rng(0)
    cnt = np.clip(rng.poisson(1.91, n), 0, 5)
    for C in (4, 8):
        bufn = np.full((n, C), nw, np.int32)
        for k in range(min(5, C)):
            m = cnt > k
            bufn[m, k] = rng.integers(0, nw, m.sum())
        buf = jnp.asarray(bufn)
        ex = jnp.full((n, 2), -9, jnp.int32)
        bt = jnp.full((n,), jnp.inf)
        btr = jnp.full((n,), -1, jnp.int32)
        act = jnp.ones((n,), bool)
        f = jax.jit(
            lambda b: test_windows(
                grid.win_data, b, o, d, ex, act, bt, btr, 1e-10, None
            )[0]
        )
        dtt = timeit(lambda: f(buf))
        print(
            f"test_windows win32 C={C}: {dtt*1e3:.3f} ms "
            f"({dtt/(n*C)*1e9:.1f} ns/slot-row)"
        )

    # ---- finalize_hits alone
    hr = shoot_grid(sp.scene, rays, grid, cap=8)
    best_tri = hr.tri_id
    best_t = jnp.where(hr.hit, hr.t, jnp.inf)
    ff = jax.jit(
        lambda bt_, btr_: finalize_hits(sp.scene, rays, bt_, btr_).t
    )
    dtf = timeit(lambda: ff(best_t, best_tri))
    print(f"finalize_hits: {dtf*1e3:.3f} ms")


if __name__ == "__main__":
    main()
