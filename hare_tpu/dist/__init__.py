"""Multi-chip / multi-host sharded execution (new layer L6 — no reference
counterpart; the reference is a single-process library)."""

from .sharding import (
    init_distributed,
    make_ray_mesh,
    make_train_step,
    sharded_histogram,
)

__all__ = [
    "init_distributed",
    "make_ray_mesh",
    "make_train_step",
    "sharded_histogram",
]
