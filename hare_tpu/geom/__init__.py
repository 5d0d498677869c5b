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
from .tribox import tri_box_overlap

__all__ = [
    "AABB",
    "DET_EPS",
    "HitRecord",
    "MIN_T",
    "NO_POLY",
    "Ray",
    "cross",
    "distance",
    "dot",
    "is_coplanar",
    "norm",
    "normalize",
    "ray_aabb",
    "ray_triangle_mt",
    "ray_triangle_watertight",
    "scalar_triple",
    "tri_box_overlap",
]
