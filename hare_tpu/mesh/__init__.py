"""Mesh compilation: welding, adjacency, planes -> device Scene (layer L3)."""

from .scene import PAD_POLY, Scene
from .topology import EdgeAux, GroupedRows, Topology, build_scene, merge_topologies
from . import shapes

__all__ = [
    "EdgeAux",
    "GroupedRows",
    "PAD_POLY",
    "Scene",
    "Topology",
    "build_scene",
    "merge_topologies",
    "shapes",
]
