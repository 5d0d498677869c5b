"""hare_tpu — a TPU-native differentiable acoustic ray tracer.

A from-scratch JAX/Pallas framework with the capabilities of
PachydermAcoustic/Hare (see SURVEY.md): watertight ray/triangle and ray/AABB
intersection, voxel-grid 3D-DDA, octree and KD-tree traversal, welded mesh
topology — plus analytic gradients and multi-chip sharding the reference
never had.
"""

from . import geom, mesh, accel
from .geom import AABB, HitRecord, NO_POLY, Ray
from .mesh import Scene, Topology, build_scene

__version__ = "0.1.0"

__all__ = [
    "AABB",
    "HitRecord",
    "NO_POLY",
    "Ray",
    "Scene",
    "Topology",
    "accel",
    "build_scene",
    "geom",
    "mesh",
]
