"""Benchmark runner: prints ONE JSON line for the driver.

Metric (BASELINE.json): Mrays/s/chip forward+backward on a ~100k-tri scene
through the voxel-grid DDA backend, gradients w.r.t. absorption.  The
reference publishes no numbers (BASELINE.md); vs_baseline is reported
against our own r1 CPU-oracle-validated first measurement recorded in
BENCH_BASELINE (update as rounds improve).
"""

import json
import time

import numpy as np

# Round-1 committed fwd+bwd artifact (BENCH_r01.json): the honest baseline —
# the first end-of-round figure the driver recorded, not a pre-optimization
# scratch measurement.
BASELINE_MRAYS = 1.167


def main():
    import jax
    import jax.numpy as jnp

    from hare_tpu.geom import Ray
    from hare_tpu.accel import SpatialPartition
    from hare_tpu.mesh import Topology, shapes
    from hare_tpu.trace import energy_histogram, trace_rays, uniform_sphere

    # 81,932-tri scene: subdivided icosphere inside a shoebox shell.  The
    # metric label says "82k" (VERDICT r3 asked label and count to match);
    # r1's committed 1.167 Mrays/s baseline was measured on THIS scene, so
    # growing it would break vs_baseline comparability (a 102k variant with
    # a second dense sphere was measured at 1.33 Mrays/s fwd+bwd — harder
    # scene, not slower code; see BASELINE.md).
    faces = shapes.shoebox(20.0, 20.0, 20.0) + shapes.icosphere(
        6, radius=6.0, center=(10.0, 10.0, 10.0)
    )
    top = Topology.build(faces)
    # Default knobs (win=16, cap=16): measured r4, the win=32/cap=8 combo
    # that wins on coherent primary rays (6.85 vs 7.35 ms raw shoot) LOSES
    # 30% inside the bounce loop — incoherent bounce-2/3 rays visit many
    # occupied cells and 32-wide rows double the gathered bytes per cell
    # while cap=8 forces extra rounds at ~8 collected rows/ray.
    sp = SpatialPartition(top, accel="grid", domain=48)

    n_rays = 1 << 15
    n_bounces = 3
    key = jax.random.PRNGKey(0)
    d = uniform_sphere(key, n_rays)
    o = jnp.tile(jnp.array([10.0, 10.0, 10.0], jnp.float32), (n_rays, 1))
    # offset origins outside the sphere so rays traverse real geometry
    o = o + 6.5 * d  # start just outside the sphere surface, heading out
    rays = Ray.make(o, d)
    a = jnp.full(top.n_polys, 0.3, jnp.float32)

    shoot_fn = sp.shoot_fn

    # NB: scene and aux are ARGUMENTS, never closures — closed-over device
    # arrays become embedded jit constants and destroy compile/step time.
    def loss(scene, a_, rays_, aux):
        res = trace_rays(scene, rays_, a_, n_bounces, shoot_fn, aux=aux)
        return jnp.sum(energy_histogram(res, 1024, 1e-3))

    fwd_bwd = jax.jit(jax.value_and_grad(loss, argnums=1))
    fwd = jax.jit(loss)

    # Warmup/compile.  NB: block_until_ready is unreliable over the axon
    # tunnel (returns before execution completes) — sync via a scalar pull.
    v, g = fwd_bwd(sp.scene, a, rays, sp.aux)
    _ = float(v) + float(jnp.sum(g))
    _ = float(fwd(sp.scene, a, rays, sp.aux))

    def timeit(fn, sync, iters=10):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(sp.scene, a, rays, sp.aux)
        sync(out)  # one sync for the whole queue
        return (time.perf_counter() - t0) / iters

    dt = timeit(fwd_bwd, lambda out: float(out[0]) + float(jnp.sum(out[1])))
    dt_f = timeit(fwd, lambda out: float(out))

    total_rays = n_rays * n_bounces  # each bounce is a full shoot
    mrays = total_rays / dt / 1e6
    mrays_f = total_rays / dt_f / 1e6
    print(
        json.dumps(
            {
                "metric": "Mrays/s/chip fwd+bwd (82k-tri scene, grid DDA, 3-bounce)",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
                "detail": {
                    "fwd_mrays": round(mrays_f, 3),
                    "fwd_ms": round(dt_f * 1e3, 2),
                    "bwd_over_fwd": round(dt / dt_f, 2),
                    "n_tris": top.n_tris,
                    "n_rays": n_rays,
                    "n_bounces": n_bounces,
                    "grid_dims": sp.struct.dims,
                    "device": str(jax.devices()[0]),
                    "step_ms": round(dt * 1e3, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
