"""Time one shoot_grid configuration on the chip: python time_shoot.py [cap]."""

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


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    domain = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    win = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    soft = (int(sys.argv[4]) or None) if len(sys.argv) > 4 else None
    faces = shapes.shoebox(20.0, 20.0, 20.0) + shapes.icosphere(
        6, radius=6.0, center=(10.0, 10.0, 10.0)
    )
    top = Topology.build(faces)
    sp = SpatialPartition(top, accel="grid", domain=domain, win=win)
    n = 1 << int(sys.argv[5]) if len(sys.argv) > 5 else 1 << 15
    d = uniform_sphere(jax.random.PRNGKey(0), n)
    o = jnp.tile(jnp.array([10.0, 10.0, 10.0], jnp.float32), (n, 1)) + 6.5 * d
    rays = Ray.make(o, d)

    def sync(x):
        return float(np.asarray(x).sum())

    _, iters, rounds, nrows = shoot_grid(
        sp.scene, rays, sp.struct, cap=cap, soft=soft, with_stats=True
    )
    it = np.asarray(iters)
    nr = np.asarray(nrows)
    f = lambda: shoot_grid(sp.scene, rays, sp.struct, cap=cap, soft=soft).t
    r = f()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(20):
        r = f()
    sync(r)
    dt = (time.perf_counter() - t0) / 20
    print(
        f"cap={cap} domain={domain} win={win} soft={soft}: {dt*1e3:.2f} ms "
        f"({n/dt/1e6:.2f} Mrays/s)  iters mean {it.mean():.1f} max "
        f"{it.max()}  rows mean {nr.mean():.2f} max {nr.max()}  "
        f"rounds {np.asarray(rounds)}  "
        f"max_cell_wins {sp.struct.max_cell_wins}  "
        f"n_wins {sp.struct.win_data.shape[0]-1}",
        flush=True,
    )


if __name__ == "__main__":
    main()
