"""Shared accel helpers: differentiable hit finalization.

Traversal (DDA / tree descent) runs inside ``lax.while_loop``, which JAX
cannot reverse-differentiate.  But the only discrete decision that matters is
*which triangle* was hit — so each backend returns the winning ``tri_id``
(an integer, gradient-free by nature), and the hit quantities (t, u, v,
point) are recomputed OUTSIDE the loop from the live ``scene.vertices`` by
one differentiable Möller–Trumbore evaluation per ray.

This is exactly the fixed-hit-topology differentiation regime (SURVEY.md §7
L5): gradients of hit distance / point w.r.t. vertex positions are the
implicit-function derivatives of the MT system at the frozen triangle
assignment, and they flow through gather-transpose scatter-adds onto shared
welded vertices.  Traversal decisions get straight-through (zero) gradient.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..geom.primitives import NO_POLY, HitRecord, Ray
from ..mesh.scene import Scene

__all__ = ["finalize_hits"]


def finalize_hits(
    scene: Scene,
    rays: Ray,
    best_t: jnp.ndarray,
    best_tri: jnp.ndarray,
    ktest: Callable,
) -> HitRecord:
    """Build a differentiable HitRecord from traversal winners.

    best_t is used only for the hit mask (isfinite); all returned values are
    recomputed differentiably from ``best_tri``.
    """
    hit = jnp.isfinite(jax.lax.stop_gradient(best_t))
    tri = jax.lax.stop_gradient(jnp.maximum(best_tri, 0))

    v = scene.vertices
    iv = scene.tri_v[tri]  # (N, 3)
    v0, v1, v2 = v[iv[:, 0]], v[iv[:, 1]], v[iv[:, 2]]
    _, t, u, vv = ktest(rays.origin, rays.direction, v0, v1, v2)

    point = rays.origin + t[..., None] * rays.direction
    poly = jnp.where(hit, scene.tri_poly[tri], NO_POLY)
    return HitRecord(
        hit=hit,
        t=jnp.where(hit, t, jnp.inf),
        u=jnp.where(hit, u, 0.0),
        v=jnp.where(hit, vv, 0.0),
        point=jnp.where(hit[..., None], point, 0.0),
        poly_id=poly.astype(jnp.int32),
        tri_id=jnp.where(hit, tri, NO_POLY).astype(jnp.int32),
    )
