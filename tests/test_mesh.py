"""Mesh compiler tests: welding, adjacency, planes, scene packing."""

import numpy as np
import pytest

from hare_tpu.mesh import PAD_POLY, Topology, build_scene, shapes


def test_shoebox_welding():
    top = Topology.build(shapes.shoebox())
    assert top.n_vertices == 8  # corners welded across all 12 tris
    assert top.n_polys == 12
    assert top.n_tris == 12
    assert top.n_edges == 18  # 12 box edges + 6 face diagonals
    assert top.n_planes == 6


def test_shoebox_quads():
    top = Topology.build(shapes.shoebox_quads())
    assert top.n_vertices == 8
    assert top.n_polys == 6
    assert top.n_tris == 12  # quads split
    assert top.n_planes == 6
    assert np.all(np.sort(top.tri_poly) == np.repeat(np.arange(6), 2))


def test_welding_idempotent(rng):
    """Re-adding faces with shared vertices does not grow the vertex count."""
    tris = shapes.icosphere(1)
    top1 = Topology.build(tris)
    top2 = Topology.build(tris + tris)  # duplicated faces, same vertices
    assert top2.n_vertices == top1.n_vertices


def test_welding_precision():
    """Coordinates differing below the rounding precision weld together."""
    t1 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    t2 = np.array([[0, 0, 1e-9], [1, 0, 0], [0, 0, 1]], float)
    top = Topology.build([t1, t2], precision=6)
    assert top.n_vertices == 4  # (0,0,0) and (0,0,1e-9) weld at precision 6
    top15 = Topology.build([t1, t2], precision=15)
    assert top15.n_vertices == 5


def test_degenerate_edge_skipped():
    """Edges shorter than 1e-4 are not created (Topology.cs:282)."""
    t = np.array([[0, 0, 0], [1e-5, 0, 0], [0, 1, 0]], float)
    top = Topology.build([t])
    # the (v0, v1) edge is degenerate -> only 2 edges for this triangle
    assert top.n_edges == 2


def test_plane_grouping():
    top = Topology.build(shapes.shoebox())
    # two triangles per wall share a plane
    assert top.n_planes == 6
    for members in top.plane_members:
        assert len(members) == 2
    # plane ids partition the polygons
    assert sorted(np.concatenate(top.plane_members).tolist()) == list(range(12))


def test_vertex_normals_unit():
    top = Topology.build(shapes.shoebox())
    ln = np.linalg.norm(top.vertex_normals, axis=1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-12)


def test_edge_tributary():
    """Tributary area per edge-polygon pair: area of (a, b, centroid)."""
    t = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], float)
    top = Topology.build([t])
    # Each edge's single tributary area should sum to the triangle's area.
    total = sum(float(a.sum()) for a in top.edge_tributary_area)
    np.testing.assert_allclose(total, top.poly_area[0], rtol=1e-12)
    # Tangents point from edge toward centroid, unit length.
    for tans in top.edge_tangents:
        for tan in tans:
            np.testing.assert_allclose(np.linalg.norm(tan), 1.0, atol=1e-12)


def test_ngon_rejected():
    pent = np.array(
        [[0, 0, 0], [1, 0, 0], [1.5, 1, 0], [0.5, 2, 0], [-0.5, 1, 0]], float
    )
    with pytest.raises(NotImplementedError):
        Topology.build([pent])


def test_indexed_ingest():
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    top = Topology.from_indexed(pts, [[0, 1, 2], [2, 3, 0]])
    assert top.n_vertices == 4 and top.n_polys == 2


def test_scene_packing_and_padding():
    top = Topology.build(shapes.shoebox())
    sc = top.scene(pad_to=128)
    assert sc.n_tris == 128
    assert int((sc.tri_poly == PAD_POLY).sum()) == 128 - 12
    # padded tris are degenerate (all vertex 0)
    assert np.all(np.asarray(sc.tri_v[12:]) == 0)


def test_multi_topology_packing():
    t1 = Topology.build(shapes.shoebox())
    t2 = Topology.build(shapes.icosphere(0, radius=0.5, center=(2, 2, 1)))
    sc = build_scene([t1, t2])
    tt = np.asarray(sc.tri_top)
    assert set(tt[: t1.n_tris + t2.n_tris].tolist()) == {0, 1}
    # polygon ids offset so they stay globally unique
    assert int(sc.tri_poly[t1.n_tris]) == t1.n_polys


def test_set_vertex():
    top = Topology.build(shapes.shoebox())
    top.set_vertex(0, (0.5, 0.5, 0.5))
    np.testing.assert_allclose(top.vertices[0], [0.5, 0.5, 0.5])


def test_device_aux_arrays():
    """Device EdgeAux: padded tributary data matches the host lists, poly
    frames are orthonormal, ray reversal flips direction (consumer-surface
    items: Hare_Geometry_Primitives.cs:288-299, 421-428;
    Hare_Geometry_Polygons.cs:173-182; Hare_Geometry_Topology.cs:169-179)."""
    from hare_tpu.geom import Ray

    top = Topology.build(shapes.shoebox())
    aux = top.device_aux()
    E = top.n_edges
    assert aux.edge_poly.shape[0] == E
    ep = np.asarray(aux.edge_poly)
    ta = np.asarray(aux.edge_tributary_area)
    for e in range(E):
        k = len(top.edge_polys[e])
        assert (ep[e, :k] == np.asarray(top.edge_polys[e])).all()
        assert (ep[e, k:] == -1).all()
        np.testing.assert_allclose(
            ta[e, :k], np.asarray(top.edge_tributary_area[e]), rtol=1e-6
        )
        assert (ta[e, k:] == 0).all()
    # total tributary area over all edges covers each wall 1x... the sum of
    # tributary areas equals the total surface area.
    np.testing.assert_allclose(ta.sum(), top.poly_area.sum(), rtol=1e-5)
    vn = np.asarray(aux.vertex_normals)
    np.testing.assert_allclose(np.linalg.norm(vn, axis=1), 1.0, atol=1e-6)
    # frames orthonormal, diffz == polygon normal
    fr = np.asarray(aux.poly_frame)
    eye = np.einsum("pij,pkj->pik", fr, fr)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-6)
    np.testing.assert_allclose(fr[:, 2], top.poly_normal, atol=1e-6)
    # Ray.reverse flips direction only
    r = Ray.make(np.zeros((4, 3), np.float32), np.ones((4, 3), np.float32))
    rr = r.reverse()
    np.testing.assert_array_equal(np.asarray(rr.direction), -np.asarray(r.direction))
    np.testing.assert_array_equal(np.asarray(rr.origin), np.asarray(r.origin))


def test_empty_topology_scene():
    """A zero-polygon topology builds a (padded-only) scene without crashing
    (ADVICE r3: IndexError on empty poly_plane)."""
    sc = build_scene([Topology.build([])])
    assert int(np.asarray(sc.tri_meta).shape[0]) > 0
    assert (np.asarray(sc.tri_poly) == PAD_POLY).all()
