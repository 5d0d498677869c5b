"""Ray/point sampling utilities.

Covers the reference's random-sampling surface — ``Triangle.GetRandomPoint``
sqrt-warp barycentric sampling (``Hare_Geometry_Polygons.cs:690-696``) and
``Quadrilateral``'s area-fraction-weighted variant (``:724-728, 839-862``) —
plus the uniform-sphere source sampling the consumer needs to start acoustic
ray sweeps (not in the reference library; part of its consumer contract).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mesh.scene import Scene

__all__ = [
    "uniform_sphere",
    "triangle_points",
    "polygon_points",
    "scene_surface_points",
]


def uniform_sphere(key: jax.Array, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """n directions uniform on S^2 (the standard acoustic source emission)."""
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (n,), dtype, -1.0, 1.0)
    phi = jax.random.uniform(k2, (n,), dtype, 0.0, 2.0 * jnp.pi)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def triangle_points(
    key: jax.Array, v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray, n: int
) -> jnp.ndarray:
    """Uniform points on a triangle via sqrt-warp barycentrics.

    ``GetRandomPoint``: u = 1 - sqrt(r1), v = r2 * sqrt(r1)
    (``Hare_Geometry_Polygons.cs:690-696``).
    """
    k1, k2 = jax.random.split(key)
    r1 = jax.random.uniform(k1, (n,))
    r2 = jax.random.uniform(k2, (n,))
    tmp = jnp.sqrt(r1)
    u = 1.0 - tmp
    v = r2 * tmp
    return v0 + u[:, None] * (v1 - v0) + v[:, None] * (v2 - v0)


def polygon_points(key: jax.Array, topology, poly_id: int, n: int) -> jnp.ndarray:
    """Uniform points on ONE polygon of a :class:`Topology`.

    ``Quadrilateral.GetRandomPoint`` parity
    (``Hare_Geometry_Polygons.cs:724-728, 839-862``): a quad samples one of
    its two triangles (0,1,2)/(2,3,0) with probability proportional to
    area, then sqrt-warp samples inside it; a triangle is
    ``Triangle.GetRandomPoint`` (``:690-696``) directly.
    """
    v = jnp.asarray(topology.vertices[topology.poly_verts[poly_id]], jnp.float32)
    if v.shape[0] == 3:
        return triangle_points(key, v[0], v[1], v[2], n)
    a1 = 0.5 * jnp.linalg.norm(jnp.cross(v[1] - v[0], v[2] - v[0]))
    a2 = 0.5 * jnp.linalg.norm(jnp.cross(v[3] - v[2], v[0] - v[2]))
    kc, k1, k2 = jax.random.split(key, 3)
    second = jax.random.uniform(kc, (n,)) < a2 / (a1 + a2)
    p1 = triangle_points(k1, v[0], v[1], v[2], n)
    p2 = triangle_points(k2, v[2], v[3], v[0], n)
    return jnp.where(second[:, None], p2, p1)


def scene_surface_points(key: jax.Array, scene: Scene, n: int) -> jnp.ndarray:
    """Area-weighted uniform points on the whole scene surface.

    Generalizes ``Quadrilateral.GetRandomPoint``'s area-fraction choice
    between its two triangles (``Hare_Geometry_Polygons.cs:724-728``) to the
    full triangle soup: triangles chosen with probability proportional to
    area, then sqrt-warp sampled.
    """
    v0, v1, v2 = scene.tri_vertices()
    area = 0.5 * jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=-1)
    k1, k2 = jax.random.split(key)
    idx = jax.random.categorical(
        k1, jnp.log(jnp.maximum(area, 1e-30)), shape=(n,)
    )
    pts = triangle_points(k2, v0[idx], v1[idx], v2[idx], n)
    return pts
