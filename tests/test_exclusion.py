"""Second origin-exclusion slot (poly_origin2) and u,v reference parity.

The reference's ``Shoot(R, top, out X, int poly_origin1, int poly_origin2)``
(``Spatial_Partition.cs:33``) exists for reflections starting on an edge
shared by two COPLANAR polygons: both must be excluded or the f32-rounded
origin can re-hit the neighbor at tiny t.  ``Scene.tri_edge_poly`` carries
the adjacency; ``trace_rays`` fills slot 2 at edge hits.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hare_tpu.geom import Ray
from hare_tpu.accel import SpatialPartition, shoot_brute
from hare_tpu.mesh import Topology, shapes
from hare_tpu.oracle import oracle_shoot
from hare_tpu.trace import trace_rays


def test_tri_edge_poly_adjacency():
    """Triangle-soup shoebox: each wall is two coplanar single-tri polygons
    sharing a diagonal; the adjacency must pair them and leave the quad
    version's internal diagonal masked (same poly id)."""
    top = Topology.build(shapes.shoebox(4, 5, 3))  # 12 tris = 12 polys
    sc = top.scene()
    tep = np.asarray(sc.tri_edge_poly)[: top.n_tris]
    tp = np.asarray(sc.tri_poly)[: top.n_tris]
    plane = np.asarray(sc.poly_plane)
    # Every triangle has at least one coplanar neighbor (its quad partner).
    for t in range(top.n_tris):
        nbrs = tep[t][tep[t] >= 0]
        assert len(nbrs) >= 1, t
        partners = [n for n in nbrs if plane[n] == plane[tp[t]]]
        assert len(partners) >= 1, t
        # the coplanar partner shares the diagonal, i.e. adjacency is mutual
        for n in partners:
            ts = np.nonzero(tp == n)[0]
            assert any(tp[t] in tep[x] for x in ts), (t, n)

    # Quad version: both halves share one poly id -> diagonal masked.
    topq = Topology.build(shapes.shoebox_quads(4, 5, 3))
    scq = topq.scene()
    tepq = np.asarray(scq.tri_edge_poly)[: topq.n_tris]
    tpq = np.asarray(scq.tri_poly)[: topq.n_tris]
    for t in range(topq.n_tris):
        assert tpq[t] not in tepq[t], (t, tepq[t])


def test_edge_reflection_excludes_coplanar_neighbor(rng):
    """Reflections landing exactly on the shared diagonal of two coplanar
    floor polygons must not re-hit either at tiny t on the next bounce."""
    top = Topology.build(shapes.shoebox(4, 5, 3))
    sp = SpatialPartition(top, accel="grid", domain=4)
    sc = sp.scene
    tp = np.asarray(sc.tri_poly)
    plane = np.asarray(sc.poly_plane)

    # Aim rays at points ON the floor diagonal from oblique directions.
    # Floor = z=0 plane; its two triangles share the diagonal (0,0)-(4,5)
    # or similar — find it from the scene: floor tris have all z == 0.
    v = np.asarray(sc.vertices)
    tv = np.asarray(sc.tri_v)[: top.n_tris]
    floor = np.nonzero([np.allclose(v[tv[t]][:, 2], 0.0) for t in range(top.n_tris)])[0]
    assert len(floor) == 2
    shared = np.intersect1d(tv[floor[0]], tv[floor[1]])
    assert len(shared) == 2
    a, b = v[shared[0]], v[shared[1]]
    floor_polys = {int(tp[floor[0]]), int(tp[floor[1]])}

    n = 32
    lam = rng.uniform(0.1, 0.9, n).astype(np.float32)
    targets = a[None] + lam[:, None] * (b - a)[None]
    origins = np.tile(np.array([[2.0, 2.5, 2.0]], np.float32), (n, 1))
    origins[:, 0] += rng.uniform(-1, 1, n)  # oblique incidence
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    absorption = jnp.zeros(top.n_polys, jnp.float32)
    res = trace_rays(
        sc, Ray.make(origins, d.astype(np.float32)), absorption, 2,
        sp.shoot_fn, aux=sp.aux,
    )
    res = jax.tree.map(np.asarray, res)
    assert res.hit[0].all()
    assert all(int(p) in floor_polys for p in res.poly_id[0])
    # Second bounce: never a floor poly at grazing-tiny distance.
    for i in range(n):
        if res.hit[1, i] and int(res.poly_id[1, i]) in floor_polys:
            assert res.t[1, i] > 0.05, (i, res.t[1, i], res.poly_id[1, i])


def test_uv_parity_vs_oracle(rng):
    """Device u,v equals the oracle's after mapping out the reference's
    Ray_Side winding flip (SURVEY.md §2: grid fast path's u=v=0 resolved —
    we always return real barycentrics, in the unflipped frame).

    Reference frame: if dot(dir, normal) < 0 the vertex order flips
    (v0,v1,v2)->(v2,v1,v0) (``Hare_Geometry_Polygons.cs:641-648``), so
    u_ref = u_dev and v_ref = 1 - u_dev - v_dev; unflipped rays match as-is.
    """
    top = Topology.build(shapes.concert_hall())
    sc = top.scene()
    o = rng.uniform((2, 2, 1), (28, 48, 16), (64, 3))
    d = rng.normal(0, 1, (64, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hr = jax.tree.map(
        np.asarray,
        shoot_brute(
            sc,
            Ray.make(o.astype(np.float32), d.astype(np.float32)),
            kernel="mt",
        ),
    )
    v = top.vertices
    for i in range(64):
        ref = oracle_shoot(top, o[i], d[i])
        assert (ref is not None) == bool(hr.hit[i]), i
        if ref is None:
            continue
        assert ref["tri_id"] == int(hr.tri_id[i]), i
        iv = top.tri_v[ref["tri_id"]]
        normal = np.cross(v[iv[1]] - v[iv[0]], v[iv[2]] - v[iv[0]])
        flipped = np.dot(d[i], normal) < 0
        u_dev, v_dev = float(hr.u[i]), float(hr.v[i])
        if flipped:
            u_map, v_map = u_dev, 1.0 - u_dev - v_dev
        else:
            u_map, v_map = u_dev, v_dev
        np.testing.assert_allclose(u_map, ref["u"], atol=2e-3)
        np.testing.assert_allclose(v_map, ref["v"], atol=2e-3)
