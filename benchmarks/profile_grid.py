"""Grid-traversal profiling: dissect shoot_grid fwd cost on the bench scene.

Measures, on the real chip:
  1. full shoot_grid forward (the number to beat),
  2. a phase-1-shaped meta-march loop at several unroll factors (how much of
     the body cost is per-while-iteration overhead vs real work),
  3. test_windows alone on a realistic candidate buffer,
  4. the raw row-gather floor.

Run:  python benchmarks/profile_grid.py
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
from hare_tpu.accel.common import WIN, test_windows
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
    sp = SpatialPartition(top, accel="grid", domain=48)
    grid = sp.struct
    n = 1 << 15
    key = jax.random.PRNGKey(0)
    d = uniform_sphere(key, n)
    o = jnp.tile(jnp.array([10.0, 10.0, 10.0], jnp.float32), (n, 1)) + 6.5 * d
    rays = Ray.make(o, d)

    # ---- 1. full shoot fwd + stats
    from hare_tpu.accel.voxel import shoot_grid

    hits, iters, rounds, nrows = shoot_grid(
        sp.scene, rays, grid, with_stats=True
    )
    it = np.asarray(iters)
    nr = np.asarray(nrows)
    print(
        f"phase-1 iters: mean {it.mean():.1f} max {it.max()} "
        f"rows/ray mean {nr.mean():.2f} max {nr.max()} "
        f"rounds {np.asarray(rounds)} max_cell_wins {grid.max_cell_wins}"
    )
    dt = timeit(lambda: shoot_grid(sp.scene, rays, grid).t)
    print(f"shoot_grid fwd: {dt*1e3:.2f} ms  ({n/dt/1e6:.2f} Mrays/s)")

    # ---- 2. meta-march loop, unroll factors (phase-1 shape, no collection)
    nx, ny, nz = grid.dims
    meta = grid.cell_meta
    dims_c = grid.dims
    gmin = grid.grid_min
    vox = grid.voxel_size
    inf = jnp.inf

    def march(unroll, n_steps=16):
        ocmp = tuple(o[:, c] for c in range(3))
        dcmp = tuple(d[:, c] for c in range(3))
        safe_d = tuple(jnp.where(dc == 0, 1.0, dc) for dc in dcmp)
        step_c = tuple(jnp.sign(dc).astype(jnp.int32) for dc in dcmp)
        t_delta = tuple(
            jnp.where(dc == 0, inf, vox[c] / jnp.abs(safe_d[c]))
            for c, dc in enumerate(dcmp)
        )
        cell = tuple(
            jnp.clip(
                jnp.floor((ocmp[c] - gmin[c]) / vox[c]).astype(jnp.int32),
                0, dims_c[c] - 1,
            )
            for c in range(3)
        )
        t_max = tuple(
            jnp.where(
                dcmp[c] == 0, inf,
                (gmin[c] + (cell[c] + (dcmp[c] > 0)) * vox[c] - ocmp[c])
                / safe_d[c],
            )
            for c in range(3)
        )

        def one(cell, t_max, acc, act):
            cx, cy, cz = cell
            tmx, tmy, tmz = t_max
            lin = (cx * ny + cy) * nz + cz
            m = meta[lin]
            acc = acc + (m[:, 1] & 0xFF)
            t_exit = jnp.minimum(jnp.minimum(tmx, tmy), tmz)
            nc, nt = [], []
            for c, (cl, tm) in enumerate(zip(cell, t_max)):
                adv = act & (tm <= t_exit)
                nc.append(cl + jnp.where(adv, step_c[c], 0))
                nt.append(tm + jnp.where(adv, t_delta[c], 0.0))
            off = act
            for c in range(3):
                off = off & (nc[c] >= 0) & (nc[c] < dims_c[c])
                nc[c] = jnp.clip(nc[c], 0, dims_c[c] - 1)
            return tuple(nc), tuple(nt), acc, off

        def body(s):
            cell, t_max, acc, act, k = s
            for _ in range(unroll):
                cell, t_max, acc, act = one(cell, t_max, acc, act)
            return (cell, t_max, acc, act, k + 1)

        def cond(s):
            return jnp.any(s[3]) & (s[4] < n_steps // unroll)

        f = jax.jit(
            lambda cell, t_max: jax.lax.while_loop(
                cond, body,
                (cell, t_max, jnp.zeros(n, jnp.int32),
                 jnp.ones(n, bool), jnp.array(0)),
            )[2]
        )
        return timeit(lambda: f(cell, t_max))

    for u in (1, 2, 4, 8, 16):
        dt_u = march(u)
        print(
            f"meta-march unroll={u:2d}: {dt_u*1e3:.2f} ms for 16 steps "
            f"-> {dt_u/16/n*1e9:.1f} ns/ray-step"
        )

    # ---- 3. test_windows alone (realistic row ids: random occupied rows)
    nw = grid.win_data.shape[0] - 1
    for C in (8, 16):
        buf = jax.random.randint(key, (n, C), 0, nw, jnp.int32)
        ex = jnp.full((n, 2), -9, jnp.int32)
        bt = jnp.full((n,), jnp.inf)
        btr = jnp.full((n,), -1, jnp.int32)
        act = jnp.ones((n,), bool)
        f = jax.jit(
            lambda buf, bt, btr: test_windows(
                grid.win_data, buf, o, d, ex, act, bt, btr, 1e-4, None,
            )[0]
        )
        dt_t = timeit(lambda: f(buf, bt, btr))
        print(
            f"test_windows C={C}: {dt_t*1e3:.2f} ms "
            f"-> {dt_t/(n*C)*1e9:.1f} ns/row"
        )

    # ---- 4. raw gather floor at the same row width
    rows = jax.random.randint(key, (n * 10,), 0, nw, jnp.int32)
    g = jax.jit(lambda r: jnp.sum(grid.win_data[r], axis=-1))
    dt_g = timeit(lambda: g(rows))
    print(
        f"raw gather {n*10} x {grid.win_data.shape[1]}-lane rows: "
        f"{dt_g*1e3:.2f} ms -> {dt_g/(n*10)*1e9:.1f} ns/row"
    )


if __name__ == "__main__":
    main()
