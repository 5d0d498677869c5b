"""Sharding-overhead measurement on the virtual CPU mesh (SURVEY.md §4.5).

Real multi-chip hardware is not reachable from this environment, so the
north-star ">=85% rays/s efficiency at >=2 hosts" cannot be measured
directly.  What CAN be measured — and what this script records — is the
cost the sharded program adds over the single-device program at identical
total work: mesh partitioning, shard_map plumbing, and the psum reduction.
On one host the collectives are memcpys, so overhead ~1.0x means the
sharded program is structurally sound; the ICI hop cost on real hardware
is additive on top and is dominated by the (tiny) histogram payload.

NB: this host exposes 2 physical cores; virtual devices share them, so
per-k wall times do NOT measure parallel speedup — only the overhead
ratio at fixed total rays is meaningful.

Run: python benchmarks/scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from hare_tpu.geom import Ray
from hare_tpu.accel import SpatialPartition
from hare_tpu.dist import make_ray_mesh, sharded_histogram
from hare_tpu.mesh import Topology, shapes
from hare_tpu.trace import energy_histogram, trace_rays, uniform_sphere


def timeit(fn, iters=5):
    r = fn()
    np.asarray(r).sum()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    np.asarray(r).sum()
    return (time.perf_counter() - t0) / iters


def main():
    top = Topology.build(shapes.concert_hall())
    sp = SpatialPartition(top, accel="grid")
    n = 1 << 15
    d = uniform_sphere(jax.random.PRNGKey(0), n)
    o = jnp.tile(jnp.array([15.0, 24.0, 8.0], jnp.float32), (n, 1))
    rays = Ray.make(o, d)
    a = jnp.full(top.n_polys, 0.3, jnp.float32)

    single = jax.jit(
        lambda scene, r_, a_, aux: energy_histogram(
            trace_rays(scene, r_, a_, 3, sp.shoot_fn, aux=aux), 256, 1e-3
        )
    )
    t1 = timeit(lambda: single(sp.scene, rays, a, sp.aux))
    rows = {"single_ms": round(t1 * 1e3, 1)}
    base_hist = np.asarray(single(sp.scene, rays, a, sp.aux))

    for k in (2, 4, 8):
        mesh = make_ray_mesh(k)
        fn = sharded_histogram(mesh, sp.shoot_fn, n_bounces=3, n_bins=256)
        tk = timeit(lambda: fn(sp.scene, rays, a, sp.aux))
        hk = np.asarray(fn(sp.scene, rays, a, sp.aux))
        # f32 accumulation order differs between the per-device partial
        # sums + psum and the single segment_sum (measured worst rel
        # ~1.5e-5 on 50k total energy).
        np.testing.assert_allclose(hk, base_hist, rtol=1e-4, atol=1e-2)
        rows[f"sharded_{k}dev_ms"] = round(tk * 1e3, 1)
        rows[f"overhead_{k}dev"] = round(tk / t1, 3)

    print(
        json.dumps(
            {
                "metric": "sharding overhead vs single device "
                "(fixed 32k rays x 3 bounces, virtual CPU mesh)",
                "value": rows["overhead_8dev"],
                "unit": "x (1.0 = free sharding)",
                "detail": rows,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
