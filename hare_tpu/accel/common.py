"""Shared accel helpers: differentiable hit finalization.

Traversal (DDA / tree descent) runs inside ``lax.while_loop``, which JAX
cannot reverse-differentiate.  But the only discrete decision that matters is
*which triangle* was hit — so each backend returns the winning ``tri_id``
(an integer, gradient-free by nature), and the hit quantities (t, u, v,
point) are recomputed OUTSIDE the loop from the live ``scene.vertices`` by
one differentiable Möller–Trumbore evaluation per ray.

This is exactly the fixed-hit-topology differentiation regime (SURVEY.md §7
L5): gradients of hit distance / point w.r.t. vertex positions are the
implicit-function derivatives of the MT system at the frozen triangle
assignment, and they flow through gather-transpose scatter-adds onto shared
welded vertices.  Traversal decisions get straight-through (zero) gradient.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geom.intersect import kernel_components
from ..geom.primitives import NO_POLY, HitRecord, Ray
from ..mesh.scene import Scene

__all__ = ["finalize_hits", "kernel_components", "pack_windows", "test_windows", "WIN"]

# Triangles per window row.  Row width = 12*WIN lanes (9 geometry components
# + 3 id lanes per triangle).  32 -> 384-lane rows (three (8,128) tiles):
# measured on-chip, gather cost is dominated by ROW COUNT, so fatter rows
# cut the test phase ~2.3x at constant data volume vs 128-lane rows.
WIN = 32


def pack_windows(
    tri: np.ndarray,
    tri_poly: np.ndarray,
    tri_top: np.ndarray,
    start: np.ndarray,
    counts: np.ndarray,
    items: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack per-group triangle lists into 128-lane window rows (host side).

    Shared device layout for every accel structure (grid cells, octree and
    KD-tree leaves): each row holds a WIN-triangle *window* of one group's
    list, geometry COMPONENT-MAJOR — lane ``c*WIN+k`` is component c
    (v0x..e2z) of instance k — so the test kernel consumes static WIN-lane
    slices with no cross-lane reshapes; triangle / polygon / topology ids
    ride bitcast in lanes 9*WIN:12*WIN.  Row ``n_windows`` is all-null.

    Args:
      tri: (T, 3, 3) triangle vertices. tri_poly/tri_top: (T,) ids.
      start/counts: (G,) CSR offsets into ``items`` per group.
      items: (total,) triangle ids, group-major.
    Returns:
      (win_data (NW+1, 12*WIN) f32, win_start (G,) i64, n_wins (G,) i64)
    """
    n_wins_per = -(-counts // WIN)
    win_start = np.concatenate([[0], np.cumsum(n_wins_per)]).astype(np.int64)
    n_windows = int(win_start[-1])
    win_data = np.zeros((n_windows + 1, 12 * WIN), np.float32)
    if n_windows:
        occ = np.nonzero(counts)[0]
        win_grp = np.repeat(occ, n_wins_per[occ])
        win_local = np.arange(n_windows) - win_start[win_grp]
        lane = np.arange(WIN)
        pos = start[win_grp][:, None] + (win_local[:, None] * WIN + lane)
        in_range = pos < (start[win_grp] + counts[win_grp])[:, None]
        pos_c = np.minimum(pos, len(items) - 1)
        t_ids = np.where(in_range, items[pos_c], -1)
        safe = np.maximum(t_ids, 0)
        g = tri[safe]  # (n_windows, WIN, 3, 3)
        v0 = g[:, :, 0, :]
        ops = np.concatenate(
            [v0, g[:, :, 1, :] - v0, g[:, :, 2, :] - v0], axis=-1
        )
        ops = np.where(in_range[:, :, None], ops, 0.0)
        win_data[:n_windows, 0 : 9 * WIN] = ops.transpose(0, 2, 1).reshape(
            n_windows, 9 * WIN
        )
        win_data[:n_windows, 9 * WIN : 10 * WIN] = np.where(
            in_range, t_ids, -1
        ).astype(np.int32).view(np.float32)
        win_data[:n_windows, 10 * WIN : 11 * WIN] = np.where(
            in_range, tri_poly[safe], -2
        ).astype(np.int32).view(np.float32)
        win_data[:n_windows, 11 * WIN : 12 * WIN] = np.where(
            in_range, tri_top[safe], -1
        ).astype(np.int32).view(np.float32)
    win_data[n_windows, 9 * WIN : 10 * WIN] = (
        np.full(WIN, -1, np.int32).view(np.float32)
    )
    win_data[n_windows, 10 * WIN : 11 * WIN] = (
        np.full(WIN, -2, np.int32).view(np.float32)
    )
    win_data[n_windows, 11 * WIN : 12 * WIN] = (
        np.full(WIN, -1, np.int32).view(np.float32)
    )
    return win_data, win_start[:-1], n_wins_per.astype(np.int64)


def test_windows(
    win_data: jnp.ndarray,
    buf: jnp.ndarray,
    o: jnp.ndarray,
    d: jnp.ndarray,
    ex: jnp.ndarray,
    active: jnp.ndarray,
    best_t: jnp.ndarray,
    best_tri: jnp.ndarray,
    min_t: float,
    top_index: Optional[int] = None,
    kernel: str = "watertight",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched candidate test: ONE gather + fused component-major test + min-t.

    ``kernel="mt"``: Möller–Trumbore in scalar-component form over the window
    rows' WIN-lane blocks (zero cross-lane reshapes); acceptance matches the
    reference (two-sided, det cutoff 1e-6,
    ``Hare_Geometry_Polygons.cs:406,417``; ``t > min_t`` and origin-polygon
    exclusion applied by the traversal layer exactly as
    ``Voxel_Grid.cs:477-491``).

    ``kernel="watertight"``: Woop/Benthin/Wald 2013 watertight variant in the
    same component-major form — per-ray shear constants computed once, edge
    functions whose signs agree across shared edges, so f32 rays through
    shared edges of adjacent triangles cannot fall through cracks (the
    reference relies on f64 everywhere instead).

    Args:
      buf: (N, C) i32 window-row ids (null rows are self-masking).
    Returns: updated (best_t, best_tri).
    """
    N, C = buf.shape
    inf = jnp.asarray(jnp.inf, win_data.dtype)
    g = win_data[buf]  # (N, C, 12*WIN)
    cmp = [g[..., WIN * i : WIN * (i + 1)] for i in range(9)]
    d_cmp = (d[:, 0, None, None], d[:, 1, None, None], d[:, 2, None, None])
    o_cmp = (o[:, 0, None, None], o[:, 1, None, None], o[:, 2, None, None])
    valid, t, _, _ = kernel_components(kernel, o_cmp, d_cmp, cmp)

    tid = jax.lax.bitcast_convert_type(g[..., 9 * WIN : 10 * WIN], jnp.int32)
    tp = jax.lax.bitcast_convert_type(g[..., 10 * WIN : 11 * WIN], jnp.int32)
    acc = (
        active[:, None, None]
        & valid
        & (t > min_t)
        & (tid >= 0)
        & (tp != ex[:, 0:1, None])
        & (tp != ex[:, 1:2, None])
    )
    if top_index is not None:
        ttop = jax.lax.bitcast_convert_type(
            g[..., 11 * WIN : 12 * WIN], jnp.int32
        )
        acc &= ttop == top_index
    t = jnp.where(acc, t, inf).reshape(N, C * WIN)
    j = jnp.argmin(t, axis=1)
    t_min = jnp.take_along_axis(t, j[:, None], 1)[:, 0]
    tri_min = jnp.take_along_axis(tid.reshape(N, C * WIN), j[:, None], 1)[:, 0]
    better = t_min < best_t
    return (
        jnp.where(better, t_min, best_t),
        jnp.where(better, tri_min, best_tri),
    )


def finalize_hits(
    scene: Scene,
    rays: Ray,
    best_t: jnp.ndarray,
    best_tri: jnp.ndarray,
    kernel: str = "watertight",
) -> HitRecord:
    """Build a differentiable HitRecord from traversal winners.

    best_t is used only for the hit mask (isfinite); all returned values are
    recomputed differentiably from ``best_tri`` via the component-major
    kernel (profiled: the (N,3)-vector form cost 4.3 ms/call at 32k rays —
    a third of the whole traversal — from 3/128-lane layout waste).
    """
    hit = jnp.isfinite(jax.lax.stop_gradient(best_t))
    tri = jax.lax.stop_gradient(jnp.maximum(best_tri, 0))

    v = scene.vertices
    iv = scene.tri_v[tri]  # (N, 3)
    v0, v1, v2 = v[iv[:, 0]], v[iv[:, 1]], v[iv[:, 2]]
    o_cmp = tuple(rays.origin[..., c] for c in range(3))
    d_cmp = tuple(rays.direction[..., c] for c in range(3))
    e1, e2 = v1 - v0, v2 - v0
    tri_cmp = tuple(v0[..., c] for c in range(3)) + tuple(
        e1[..., c] for c in range(3)
    ) + tuple(e2[..., c] for c in range(3))
    _, t, u, vv = kernel_components(kernel, o_cmp, d_cmp, tri_cmp)
    t = jnp.where(hit, t, 0.0)  # keep grads NaN-free on misses

    point = rays.origin + t[..., None] * rays.direction
    poly = jnp.where(hit, scene.tri_poly[tri], NO_POLY)
    return HitRecord(
        hit=hit,
        t=jnp.where(hit, t, jnp.inf),
        u=jnp.where(hit, u, 0.0),
        v=jnp.where(hit, vv, 0.0),
        point=jnp.where(hit[..., None], point, 0.0),
        poly_id=poly.astype(jnp.int32),
        tri_id=jnp.where(hit, tri, NO_POLY).astype(jnp.int32),
    )
