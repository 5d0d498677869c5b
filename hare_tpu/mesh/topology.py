"""Host-side mesh compiler: welding, adjacency, planes — emits a `Scene`.

TPU-native restructuring of ``Hare_Geometry_Topology.cs``: the reference
builds a pointer graph (``Vertex``/``Edge``/``Polygon`` objects with
back-references, guarded by ``Top_Lock`` for multithreaded ``Add_Polygon``);
here mesh compilation is vectorized NumPy with no locks — welding is an
``np.unique`` over rounded coordinates instead of the two-level
``SortedDictionary`` spatial-hash probe (``AddGetIndex``,
``Hare_Geometry_Topology.cs:342-377``), and edge dedup is ``np.unique`` over
canonical vertex-index pairs instead of ``Edge.Hash`` dictionaries
(``:379-397``, ``Hare_Geometry_Primitives.cs:340-387``).

Semantics preserved from the reference:

- welding precision: coordinates rounded to ``precision`` significant-ish
  decimal digits before welding (``Point.Round``,
  ``Hare_Geometry_Primitives.cs:230-235``; default 15 a la ``Topology()``).
- degenerate edges (length < 1e-4) skipped (``Hare_Geometry_Topology.cs:282``).
- polygons limited to 3 or 4 vertices (``:287-298``); quads split into
  triangles (0,1,2)+(2,3,0) per ``Quadrilateral.Intersect``.
- plane grouping by sign-normalized (a,b,c,d) rounded to 3 digits
  (``Plane``, ``Hare_Geometry_Primitives.cs:483-515``;
  grouping loop ``Hare_Geometry_Topology.cs:313-336``).
- edge tributary area/length/tangent per incident polygon
  (``Edge.Append_Poly_Relationship``, ``Hare_Geometry_Primitives.cs:288-299``).
- vertex normals = normalized sum of incident polygon unit normals
  (``Finish_Topology``, ``Hare_Geometry_Topology.cs:169-179``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .scene import PAD_POLY, Scene

__all__ = ["Topology", "build_scene", "merge_topologies"]

# Degenerate-edge threshold (Hare_Geometry_Topology.cs:282).
MIN_EDGE_LEN = 1e-4


def _round_prec(x: np.ndarray, precision: int) -> np.ndarray:
    """``Point.Round(Precision)``: round to `precision` decimal digits."""
    return np.round(x, precision)


@dataclass
class Topology:
    """Compiled mesh topology (host arrays, float64).

    Produced by :func:`Topology.build`; all arrays are NumPy.  The device
    handoff is :meth:`scene` which downcasts to f32 padded arrays.
    """

    # Core
    vertices: np.ndarray  # (V, 3) f64 welded vertex positions
    poly_verts: List[np.ndarray]  # per polygon: (3,) or (4,) vertex indices
    tri_v: np.ndarray  # (T, 3) i32 triangulated faces
    tri_poly: np.ndarray  # (T,) i32 polygon id per triangle
    # Plane grouping
    poly_plane: np.ndarray  # (P,) i32 plane id per polygon
    plane_members: List[np.ndarray]  # per plane: polygon ids
    planes: np.ndarray  # (NP, 4) f64 sign-normalized (a,b,c,d)
    # Adjacency
    edges: np.ndarray  # (E, 2) i32 canonical vertex pairs
    edge_polys: List[np.ndarray]  # per edge: incident polygon ids
    edge_tributary_area: List[np.ndarray]  # per edge: area per incident poly
    edge_tributary_length: List[np.ndarray]
    edge_tangents: List[np.ndarray]  # per edge: (k,3) unit toward centroid
    poly_edges: List[np.ndarray]  # per polygon: edge ids
    vertex_polys: List[np.ndarray]  # per vertex: incident polygon ids
    # Derived
    poly_normal: np.ndarray  # (P, 3) f64 unit normals
    poly_centroid: np.ndarray  # (P, 3) f64
    poly_area: np.ndarray  # (P,) f64
    vertex_normals: np.ndarray  # (V, 3) f64
    bbox_min: np.ndarray  # (3,) padded by 1e-12 like the reference
    bbox_max: np.ndarray
    precision: int = 15

    # ------------------------------------------------------------------ build
    @classmethod
    def build(
        cls, faces: Sequence[np.ndarray], precision: int = 15
    ) -> "Topology":
        """Compile a list of faces (each ``(K, 3)``, K in {3, 4}).

        The ``Build_Topology(Point[][])`` analog
        (``Hare_Geometry_Topology.cs:258-340``).
        """
        faces = [np.asarray(f, np.float64) for f in faces]
        for f in faces:
            if f.shape[0] not in (3, 4):
                raise NotImplementedError(
                    "polygons of more than 4 (or fewer than 3) sides are not "
                    "supported (Hare_Geometry_Topology.cs:298)"
                )

        # --- Weld: round then unique over all corners (AddGetIndex analog).
        counts = np.array([f.shape[0] for f in faces])
        flat = _round_prec(np.concatenate(faces, axis=0), precision)
        vertices, inverse = np.unique(flat, axis=0, return_inverse=True)
        # np.unique sorts; keep first-appearance order like the reference's
        # incremental indexing so vertex ids are stable under face order.
        first_pos = np.full(len(vertices), len(flat), np.int64)
        np.minimum.at(first_pos, inverse, np.arange(len(flat)))
        order = np.argsort(first_pos, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        vertices = vertices[order]
        inverse = rank[inverse]

        offsets = np.concatenate([[0], np.cumsum(counts)])
        poly_verts = [
            inverse[offsets[i] : offsets[i + 1]].astype(np.int32)
            for i in range(len(faces))
        ]

        # --- Per-polygon centroid / normal / area (Polygon ctor analog).
        P = len(poly_verts)
        poly_normal = np.zeros((P, 3))
        poly_centroid = np.zeros((P, 3))
        poly_area = np.zeros(P)
        tri_v_list, tri_poly_list = [], []
        for i, pv in enumerate(poly_verts):
            pts = vertices[pv]
            poly_centroid[i] = pts.mean(axis=0)
            # First non-zero fan normal (Hare_Geometry_Polygons.cs:159-163).
            n = np.zeros(3)
            for j in range(2, len(pv)):
                n = np.cross(pts[1] - pts[0], pts[j] - pts[0])
                if np.dot(n, n) > 0:
                    break
            ln = np.linalg.norm(n)
            poly_normal[i] = n / ln if ln > 0 else n
            if len(pv) == 3:
                tri_v_list.append(pv[[0, 1, 2]])
                tri_poly_list.append(i)
                poly_area[i] = 0.5 * np.linalg.norm(
                    np.cross(pts[1] - pts[0], pts[2] - pts[0])
                )
            else:  # quad -> (0,1,2) + (2,3,0), Hare_Geometry_Polygons.cs:731-782
                tri_v_list.append(pv[[0, 1, 2]])
                tri_v_list.append(pv[[2, 3, 0]])
                tri_poly_list += [i, i]
                poly_area[i] = 0.5 * np.linalg.norm(
                    np.cross(pts[1] - pts[0], pts[2] - pts[0])
                ) + 0.5 * np.linalg.norm(np.cross(pts[3] - pts[2], pts[0] - pts[2]))
        tri_v = np.asarray(tri_v_list, np.int32).reshape(-1, 3)
        tri_poly = np.asarray(tri_poly_list, np.int32)

        # --- Plane grouping by sign-normalized rounded (a,b,c,d).
        a_d = -np.einsum("ij,ij->i", poly_normal, vertices[[pv[0] for pv in poly_verts]])
        abcd = np.concatenate([poly_normal, a_d[:, None]], axis=1)
        flip = abcd[:, 3] < 0
        abcd[flip] *= -1.0
        key = np.round(abcd, 3)
        planes, plane_inv = np.unique(key, axis=0, return_inverse=True)
        # stable first-appearance ordering again
        first = np.full(len(planes), P, np.int64)
        np.minimum.at(first, plane_inv, np.arange(P))
        order = np.argsort(first, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        planes = planes[order]
        poly_plane = rank[plane_inv].astype(np.int32)
        plane_members = [
            np.nonzero(poly_plane == k)[0].astype(np.int32)
            for k in range(len(planes))
        ]

        # --- Edges: canonical sorted pairs, unique; skip short edges.
        e_pairs, e_poly = [], []
        for i, pv in enumerate(poly_verts):
            k = len(pv)
            for p in range(k):
                va, vb = pv[p], pv[(p + 1) % k]
                if np.linalg.norm(vertices[va] - vertices[vb]) < MIN_EDGE_LEN:
                    continue  # Hare_Geometry_Topology.cs:282
                e_pairs.append((min(va, vb), max(va, vb)))
                e_poly.append(i)
        if e_pairs:
            e_arr = np.asarray(e_pairs, np.int64)
            edges, e_inv = np.unique(e_arr, axis=0, return_inverse=True)
        else:
            edges = np.zeros((0, 2), np.int64)
            e_inv = np.zeros((0,), np.int64)
        E = len(edges)
        edge_polys: List[List[int]] = [[] for _ in range(E)]
        edge_ta: List[List[float]] = [[] for _ in range(E)]
        edge_tl: List[List[float]] = [[] for _ in range(E)]
        edge_tan: List[List[np.ndarray]] = [[] for _ in range(E)]
        poly_edges: List[List[int]] = [[] for _ in range(P)]
        for eid, pid in zip(e_inv, e_poly):
            a, b = vertices[edges[eid][0]], vertices[edges[eid][1]]
            c = poly_centroid[pid]
            # Edge.Append_Poly_Relationship (Hare_Geometry_Primitives.cs:288-299)
            edge_polys[eid].append(pid)
            edge_ta[eid].append(0.5 * np.linalg.norm(np.cross(b - a, c - a)))
            ab = b - a
            t = np.dot(c - a, ab) / np.dot(ab, ab)
            closest = a + t * ab
            tan = c - closest
            tl = np.linalg.norm(tan)
            edge_tl[eid].append(tl)
            edge_tan[eid].append(tan / tl if tl > 0 else tan)
            poly_edges[pid].append(eid)

        # --- Vertex adjacency + normals (Finish_Topology analog).
        vertex_polys: List[List[int]] = [[] for _ in range(len(vertices))]
        vertex_normals = np.zeros_like(vertices)
        for i, pv in enumerate(poly_verts):
            for vid in pv:
                vertex_polys[vid].append(i)
                vertex_normals[vid] += poly_normal[i]
        ln = np.linalg.norm(vertex_normals, axis=1, keepdims=True)
        vertex_normals = np.where(ln > 0, vertex_normals / np.where(ln > 0, ln, 1), 0.0)

        pad = 1e-12  # Hare_Geometry_Topology.cs:165-166
        return cls(
            vertices=vertices,
            poly_verts=poly_verts,
            tri_v=tri_v,
            tri_poly=tri_poly,
            poly_plane=poly_plane,
            plane_members=plane_members,
            planes=planes,
            edges=edges.astype(np.int32),
            edge_polys=[np.asarray(x, np.int32) for x in edge_polys],
            edge_tributary_area=[np.asarray(x) for x in edge_ta],
            edge_tributary_length=[np.asarray(x) for x in edge_tl],
            edge_tangents=[np.asarray(x) for x in edge_tan],
            poly_edges=[np.asarray(x, np.int32) for x in poly_edges],
            vertex_polys=[np.asarray(x, np.int32) for x in vertex_polys],
            poly_normal=poly_normal,
            poly_centroid=poly_centroid,
            poly_area=poly_area,
            vertex_normals=vertex_normals,
            bbox_min=vertices.min(axis=0) - pad if len(vertices) else np.zeros(3),
            bbox_max=vertices.max(axis=0) + pad if len(vertices) else np.zeros(3),
            precision=precision,
        )

    @classmethod
    def from_indexed(
        cls, points: np.ndarray, faces: Sequence[Sequence[int]], precision: int = 15
    ) -> "Topology":
        """``Set_Topology(Point[], int[][])`` analog
        (``Hare_Geometry_Topology.cs:518-532``): indexed-mesh ingest.  Still
        welds (indices may alias coincident points)."""
        points = np.asarray(points, np.float64)
        return cls.build([points[np.asarray(f)] for f in faces], precision)

    # ----------------------------------------------------------------- counts
    @property
    def n_vertices(self) -> int:
        return len(self.vertices)

    @property
    def n_polys(self) -> int:
        return len(self.poly_verts)

    @property
    def n_tris(self) -> int:
        return len(self.tri_v)

    @property
    def n_edges(self) -> int:
        return len(self.edges)

    @property
    def n_planes(self) -> int:
        return len(self.planes)

    # ----------------------------------------------------------- device scene
    def scene(
        self,
        dtype=np.float32,
        pad_to: int = 128,
        top_index: int = 0,
        n_topologies: int = 1,
    ) -> Scene:
        """Emit the padded device :class:`Scene` pytree."""
        return build_scene([self], dtype=dtype, pad_to=pad_to)

    def set_vertex(self, index: int, xyz) -> None:
        """In-place coordinate update (``Set_Vertex``,
        ``Hare_Geometry_Topology.cs:506-511``).  Derived host quantities are
        NOT recomputed (matching the reference, which also leaves polygon
        normals stale); device kernels recompute from vertices anyway."""
        self.vertices[index] = np.asarray(xyz, np.float64)


def _ceil_to(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


def build_scene(
    topologies: Sequence[Topology], dtype=np.float32, pad_to: int = 128
) -> Scene:
    """Pack one or more topologies into a single padded device Scene.

    The multi-topology model (``Spatial_Partition.Model`` being a
    ``Topology[]``, ``Spatial_Partition.cs:29``) is realized as a ``tri_top``
    id array — unlike the reference octree/KD-tree, which rebuild and
    overwrite the root per topology and only actually serve the last one
    (defect noted at ``KDTree.cs:71-87`` / ``Octree - alt.cs:63-88``).
    """
    v_parts, tv_parts, tp_parts, tt_parts, pp_parts = [], [], [], [], []
    v_off = p_off = 0
    for ti, top in enumerate(topologies):
        v_parts.append(top.vertices)
        tv_parts.append(top.tri_v + v_off)
        tp_parts.append(top.tri_poly + p_off)
        tt_parts.append(np.full(top.n_tris, ti, np.int32))
        pp_parts.append(top.poly_plane)
        v_off += top.n_vertices
        p_off += top.n_polys
    vertices = np.concatenate(v_parts, axis=0)
    tri_v = np.concatenate(tv_parts, axis=0)
    tri_poly = np.concatenate(tp_parts, axis=0)
    tri_top = np.concatenate(tt_parts, axis=0)
    poly_plane = np.concatenate(pp_parts, axis=0)

    T = len(tri_v)
    Tp = _ceil_to(T, pad_to)
    tri_v = np.concatenate([tri_v, np.zeros((Tp - T, 3), np.int32)])
    tri_poly = np.concatenate([tri_poly, np.full(Tp - T, PAD_POLY, np.int32)])
    tri_top = np.concatenate([tri_top, np.full(Tp - T, -1, np.int32)])

    return Scene(
        vertices=jnp.asarray(vertices, dtype),
        tri_v=jnp.asarray(tri_v),
        tri_poly=jnp.asarray(tri_poly),
        tri_top=jnp.asarray(tri_top),
        poly_plane=jnp.asarray(poly_plane),
    )


def merge_topologies(topologies: Sequence[Topology]) -> Scene:
    return build_scene(topologies)
