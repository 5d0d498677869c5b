"""Acceleration structures behind one ``shoot`` API (reference layer L4).

The ``Spatial_Partition`` contract (``Spatial_Partition.cs:27-35``): every
structure answers the same nearest-hit query and must agree with brute force.
"""

from .brute import shoot_brute

__all__ = ["shoot_brute"]
