"""Acceleration structures behind one ``shoot`` API (reference layer L4).

The ``Spatial_Partition`` contract (``Spatial_Partition.cs:27-35``): every
structure answers the same nearest-hit query and must agree with brute force.
"""

from .brute import shoot_brute
from .voxel import VoxelGrid, build_voxel_grid, shoot_grid
from .octree import Octree, build_octree, shoot_octree
from .kdtree import KDTree, build_kdtree, shoot_kdtree
from .ropes import KDRopes, build_kdtree_ropes, shoot_kdtree_ropes
from .partition import SpatialPartition

__all__ = [
    "SpatialPartition",
    "KDRopes",
    "KDTree",
    "Octree",
    "VoxelGrid",
    "build_kdtree",
    "build_kdtree_ropes",
    "build_octree",
    "build_voxel_grid",
    "shoot_brute",
    "shoot_grid",
    "shoot_kdtree",
    "shoot_kdtree_ropes",
    "shoot_octree",
]
