"""Geometric primitives and intersection kernels (reference layers L1/L2)."""

from .math import cross, distance, dot, is_coplanar, norm, normalize, scalar_triple
from .primitives import AABB, NO_POLY, HitRecord, Ray
from .intersect import (
    DET_EPS,
    MIN_T,
    ray_aabb,
    ray_triangle_mt,
    ray_triangle_watertight,
)
from .closest import (
    closest_point_aabb,
    closest_point_plane,
    closest_point_segment,
    closest_point_triangle,
    dist_to_plane,
    ray_side,
    sq_distance_to_edges,
)
from .tribox import poly_box_overlap_area, tri_box_overlap

__all__ = [
    "AABB",
    "DET_EPS",
    "HitRecord",
    "MIN_T",
    "NO_POLY",
    "Ray",
    "closest_point_aabb",
    "closest_point_plane",
    "closest_point_segment",
    "closest_point_triangle",
    "cross",
    "dist_to_plane",
    "distance",
    "dot",
    "is_coplanar",
    "norm",
    "normalize",
    "poly_box_overlap_area",
    "ray_aabb",
    "ray_side",
    "ray_triangle_mt",
    "ray_triangle_watertight",
    "scalar_triple",
    "sq_distance_to_edges",
    "tri_box_overlap",
]
