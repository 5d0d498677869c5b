"""Vertex-position gradients through every accel backend (fixed topology).

The traversal loops are reverse-AD-opaque; finalize_hits recomputes hit
values differentiably from the winning triangle, so all backends must give
the same gradients as brute force (which differentiates end to end).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hare_tpu.geom import Ray
from hare_tpu.accel import SpatialPartition
from hare_tpu.mesh import Topology, shapes
from hare_tpu.trace import trace_rays, uniform_sphere


@pytest.mark.quick
@pytest.mark.parametrize("accel", ["grid", "octree", "kdtree"])
def test_vertex_grads_match_brute(accel):
    top = Topology.build(shapes.shoebox(4, 5, 3))
    ref = SpatialPartition(top, accel="brute")
    sp = SpatialPartition(top, accel=accel)
    absorption = jnp.full(top.n_polys, 0.2, jnp.float32)
    o = jnp.tile(jnp.array([2.0, 2.5, 1.5], jnp.float32), (32, 1))
    d = uniform_sphere(jax.random.PRNGKey(7), 32)
    rays = Ray.make(o, d)

    def loss(verts, s):
        res = trace_rays(s.scene.with_vertices(verts), rays, absorption, 2, s.shoot_fn)
        return jnp.sum(res.t * res.energy * res.hit)

    v0 = ref.scene.vertices
    g_ref = np.asarray(jax.grad(lambda v: loss(v, ref))(v0))
    g_acc = np.asarray(jax.grad(lambda v: loss(v, sp))(v0))
    assert np.isfinite(g_acc).all()
    np.testing.assert_allclose(g_acc, g_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("accel", ["grid", "octree", "kdtree"])
def test_absorption_grads_match_brute(accel):
    top = Topology.build(shapes.shoebox(4, 5, 3))
    ref = SpatialPartition(top, accel="brute")
    sp = SpatialPartition(top, accel=accel)
    o = jnp.tile(jnp.array([2.0, 2.5, 1.5], jnp.float32), (64, 1))
    d = uniform_sphere(jax.random.PRNGKey(11), 64)
    rays = Ray.make(o, d)

    def loss(a, s):
        res = trace_rays(s.scene, rays, a, 3, s.shoot_fn)
        return jnp.sum(res.energy * res.hit)

    a0 = jnp.full(top.n_polys, 0.3, jnp.float32)
    g_ref = np.asarray(jax.grad(lambda a: loss(a, ref))(a0))
    g_acc = np.asarray(jax.grad(lambda a: loss(a, sp))(a0))
    np.testing.assert_allclose(g_acc, g_ref, rtol=1e-5, atol=1e-6)
