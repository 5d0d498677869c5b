"""Checkpoint / resume via Orbax (SURVEY.md §5).

The reference serializes nothing — accel structures are rebuilt from the
mesh each run (``Voxel_Grid.cs:48-121``) and there is no notion of a long
sweep to resume.  For inverse-design optimization sweeps this module
checkpoints exactly what SURVEY.md prescribes: mesh vertex array, material
parameters, optimizer state, RNG key, and the ray-batch cursor.  Accel
structures are deterministic functions of the mesh and are REBUILT on
restore, never stored.

Failure-recovery contract (SURVEY.md §5 failure detection): fail fast on
host loss and restart from the latest step — :func:`latest_step` +
:func:`restore_state` implement the restart side; pair with a process
supervisor for detection.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save_state", "restore_state", "latest_step"]


def _manager(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_state(directory: str, step: int, state: Any) -> None:
    """Save a pytree ``state`` (params, opt_state, rng key, cursor, ...).

    Blocks until the write is durable (wait_until_finished) so a crash
    immediately after return cannot lose the step.
    """
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    """Most recent checkpointed step, or None when none exists."""
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_state(directory: str, template: Any, step: Optional[int] = None) -> Any:
    """Restore the pytree saved at ``step`` (default: latest).

    ``template`` supplies the structure/dtypes (e.g. the freshly-initialized
    state) so restoration works across process restarts.
    """
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {directory}")
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        template,
    )
    out = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return out
