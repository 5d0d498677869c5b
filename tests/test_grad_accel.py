"""Vertex-position gradients through every accel backend (fixed topology).

The traversal loops are reverse-AD-opaque; finalize_hits recomputes hit
values differentiably from the winning triangle, so all backends must give
the same gradients as brute force (which differentiates end to end).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from hare_tpu.geom import Ray
from hare_tpu.accel import SpatialPartition
from hare_tpu.mesh import Topology, shapes
from hare_tpu.trace import energy_histogram, trace_rays, uniform_sphere


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


@pytest.mark.quick
@pytest.mark.parametrize("accel", ["grid", "octree", "kdtree"])
def test_loss_responds_to_vertices(accel):
    """r4 verdict headline hole: every accel backend's FORWARD was
    bit-identical under any vertex change (finalize read build-time
    tri_geom rows), so fit_vertices could not descend.  with_vertices now
    refreshes the geometry rows in-jit: the loss must move, and must match
    the fully-live brute value (same frozen-hit assignment — traversal
    tables are stale by contract, but a 2% scale preserves hit topology
    on a convex room up to coplanar quad-diagonal flips)."""
    top = Topology.build(shapes.shoebox(4, 5, 3))
    ref = SpatialPartition(top, accel="brute")
    sp = SpatialPartition(top, accel=accel)
    absorption = jnp.full(top.n_polys, 0.2, jnp.float32)
    n = 64
    o = jnp.tile(jnp.array([2.0, 2.5, 1.5], jnp.float32), (n, 1))
    d = uniform_sphere(jax.random.PRNGKey(5), n)
    rays = Ray.make(o, d)

    def loss(s, part):
        res = trace_rays(s, rays, absorption, 2, part.shoot_fn, aux=part.aux)
        return float(jnp.sum(res.t * res.energy * res.hit))

    v1 = sp.scene.vertices * 1.02
    base = loss(sp.scene, sp)
    moved = loss(sp.scene.with_vertices(v1), sp)
    assert moved != base  # the r4 bug: these were bit-identical
    ref_moved = loss(ref.scene.with_vertices(v1), ref)
    np.testing.assert_allclose(moved, ref_moved, rtol=1e-3)


@pytest.mark.parametrize("accel", ["grid", "kdtree"])
def test_vertex_descent_reduces_loss(accel):
    """Multi-step vertex optimization through the SOFT histogram descends
    (the hard histogram is piecewise-constant in arrival time — zero
    vertex gradient a.e. — so this is the end-to-end path fit_vertices
    users actually need)."""
    top = Topology.build(shapes.shoebox(4, 5, 3))
    sp = SpatialPartition(top, accel=accel)
    absorption = jnp.full(top.n_polys, 0.2, jnp.float32)
    n = 128
    o = jnp.tile(jnp.array([2.0, 2.5, 1.5], jnp.float32), (n, 1))
    d = uniform_sphere(jax.random.PRNGKey(3), n)
    rays = Ray.make(o, d)
    v_build = sp.scene.vertices
    v_true = v_build * 1.03

    def hist(verts):
        res = trace_rays(
            sp.scene.with_vertices(verts), rays, absorption, 2,
            sp.shoot_fn, aux=sp.aux,
        )
        return energy_histogram(res, 64, 2e-3, soft=True)

    target = hist(v_true)
    val_grad = jax.jit(
        jax.value_and_grad(lambda v: jnp.mean((hist(v) - target) ** 2))
    )
    opt = optax.adam(2e-2)
    v = v_build
    state = opt.init(v)
    losses = []
    for _ in range(40):
        l, g = val_grad(v)
        upd, state = opt.update(g, state)
        v = optax.apply_updates(v, upd)
        losses.append(float(l))
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])


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
