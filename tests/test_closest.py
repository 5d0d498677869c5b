"""Closest-point / distance queries vs scipy-free float64 oracles."""

import numpy as np
import jax.numpy as jnp

from hare_tpu.geom import (
    closest_point_aabb,
    closest_point_plane,
    closest_point_segment,
    closest_point_triangle,
    dist_to_plane,
    poly_box_overlap_area,
    ray_side,
    sq_distance_to_edges,
)
from hare_tpu.mesh import Topology, shapes


def brute_closest_on_triangle(p, a, b, c, n=400):
    """Dense barycentric sampling oracle."""
    u = np.linspace(0, 1, n)
    uu, vv = np.meshgrid(u, u)
    m = uu + vv <= 1.0
    uu, vv = uu[m], vv[m]
    pts = a[None] + uu[:, None] * (b - a)[None] + vv[:, None] * (c - a)[None]
    d = np.linalg.norm(pts - p[None], axis=1)
    return d.min()


def test_closest_point_triangle_regions(rng):
    a = np.array([0.0, 0.0, 0.0])
    b = np.array([2.0, 0.0, 0.0])
    c = np.array([0.0, 2.0, 0.0])
    for p in [
        np.array([-1.0, -1.0, 0.5]),  # vertex a region
        np.array([3.0, -0.5, -0.2]),  # vertex b region
        np.array([-0.5, 3.0, 1.0]),  # vertex c region
        np.array([1.0, -1.0, 0.3]),  # edge ab region
        np.array([-1.0, 1.0, 0.3]),  # edge ac region
        np.array([2.0, 2.0, 0.3]),  # edge bc region
        np.array([0.4, 0.4, 0.7]),  # interior (projects inside)
    ]:
        q = np.asarray(
            closest_point_triangle(jnp.asarray(p), jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
        )
        d_oracle = brute_closest_on_triangle(p, a, b, c)
        assert abs(np.linalg.norm(q - p) - d_oracle) < 2e-2


def test_closest_point_triangle_batch(rng):
    T = 200
    tri = rng.normal(0, 1, (T, 3, 3))
    p = rng.normal(0, 2, (T, 3))
    q = np.asarray(
        closest_point_triangle(
            jnp.asarray(p), jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]), jnp.asarray(tri[:, 2])
        )
    )
    for i in range(0, T, 17):
        d_o = brute_closest_on_triangle(p[i], tri[i, 0], tri[i, 1], tri[i, 2])
        assert np.linalg.norm(q[i] - p[i]) <= d_o + 2e-2


def test_closest_point_segment():
    a = np.zeros(3)
    b = np.array([4.0, 0.0, 0.0])
    q = np.asarray(closest_point_segment(jnp.asarray([2.0, 3.0, 0.0]), jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(q, [2.0, 0.0, 0.0], atol=1e-6)
    q = np.asarray(closest_point_segment(jnp.asarray([-2.0, 1.0, 0.0]), jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(q, a, atol=1e-6)
    q = np.asarray(closest_point_segment(jnp.asarray([9.0, 1.0, 0.0]), jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(q, b, atol=1e-6)


def test_closest_point_aabb():
    q = np.asarray(
        closest_point_aabb(jnp.asarray([5.0, -1.0, 0.5]), jnp.zeros(3), jnp.ones(3))
    )
    np.testing.assert_allclose(q, [1.0, 0.0, 0.5], atol=1e-7)


def test_plane_queries():
    n = jnp.asarray([0.0, 0.0, 2.0])  # non-unit on purpose
    d = jnp.asarray(4.0)  # plane z = 2 (n·x = 4)
    q = jnp.asarray([1.0, 2.0, 5.0])
    assert abs(float(dist_to_plane(q, n, d)) - 3.0) < 1e-6
    cp = np.asarray(closest_point_plane(q, n, d))
    np.testing.assert_allclose(cp, [1.0, 2.0, 2.0], atol=1e-6)
    assert bool(ray_side(jnp.asarray([0.0, 0.0, 1.0]), n))
    assert not bool(ray_side(jnp.asarray([0.0, 0.0, -1.0]), n))


def test_sq_distance_to_edges():
    tri = jnp.asarray([[0.0, 0, 0], [2.0, 0, 0], [0.0, 2, 0]])
    # point nearest to the closing edge (2,0) — the edge the reference's
    # buggy % (n-1) enumeration would skip
    p = jnp.asarray([-1.0, 1.0, 0.0])
    assert abs(float(sq_distance_to_edges(p, tri)) - 1.0) < 1e-6
    # interior point: nearest edge, not 0
    p = jnp.asarray([0.3, 0.3, 0.0])
    assert abs(float(sq_distance_to_edges(p, tri)) - 0.09) < 1e-6


def test_poly_box_overlap_area():
    # unit square fully inside a big box
    sq = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    assert abs(poly_box_overlap_area(sq, [-5, -5, -1], [5, 5, 1]) - 1.0) < 1e-12
    # box clips the right half
    assert abs(poly_box_overlap_area(sq, [0.5, -5, -1], [5, 5, 1]) - 0.5) < 1e-12
    # disjoint
    assert poly_box_overlap_area(sq, [2, 2, -1], [3, 3, 1]) == 0.0
    # diagonal clip of a triangle: x>=.5, y>=.5, x+y<=2 is a half-size copy
    tr = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], float)
    a = poly_box_overlap_area(tr, [0.5, 0.5, -1], [2, 2, 1])
    assert abs(a - 0.5) < 1e-12


def test_topology_flags_and_queries():
    # convex quad + a non-convex (dart) quad
    faces = [
        np.array([[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0]], float),
        np.array([[5, 0, 0], [7, 0, 0], [5.5, 0.5, 0], [5, 2, 0]], float),
    ]
    top = Topology.build(faces)
    assert top.poly_convex[0]
    assert not top.poly_convex[1]
    assert not top.poly_degenerate.any()
    assert abs(top.polygon_area(0) - 4.0) < 1e-12
    np.testing.assert_allclose(top.polygon_centroid(0), [1, 1, 0], atol=1e-12)
    assert abs(abs(top.dist_to_plane([1, 1, 3], 0)) - 3.0) < 1e-12
    cp = top.closest_point([5.0, 5.0, 1.0], 0)
    np.testing.assert_allclose(cp, [2, 2, 0], atol=1e-6)


def test_degenerate_polygon_flagged():
    faces = [np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], float),
             np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)]
    top = Topology.build(faces)
    assert top.poly_degenerate[0]
    assert not top.poly_degenerate[1]
