"""Uniform voxel grid with 3-D DDA traversal (the primary accel structure).

TPU-native rebuild of ``Voxel_Grid`` (``Voxel_Grid.cs:27-792``, "concept
based on Amanatides" — Amanatides & Woo 1987) plus the empty-space-skip idea
of ``Voxel_Grid_Adaptive`` (``Voxel_Grid - alt.cs``), redesigned for the
memory system of a TPU:

Build (host, vectorized NumPy — replaces the thread-per-core fill with
100 ms sleep-join polling, ``Voxel_Grid.cs:92-120``):
  - fixed ``domain^3`` grid over the padded model AABB (``:48-121``), or the
    adaptive ctor's criterion: keep doubling per-axis resolution until the
    average triangle count per *occupied* voxel drops below ``avg_polys`` or
    ``max_doublings`` is reached (``:128-254``).
  - membership by the same SAT triangle/box test (``AABB_Tri_Int.cs``) with
    the reference's 0.1% voxel padding (``Voxel_Grid.cs:283-285``).
  - layout: CSR offsets + **instance-major geometry** — every (cell,
    triangle) instance stores its [v0 | e1 | e2] Möller–Trumbore operands
    contiguously in cell order, so a traversal step gathers W consecutive
    288-byte rows per ray instead of W scattered 12-byte vertex rows
    (scattered row gathers are the difference between ~1.5 ms and ~µs steps
    on TPU).
  - a chebyshev **distance field** over cells (the principled version of the
    reference's six ``UInt16`` directional step tables,
    ``Voxel_Grid - alt.cs:44, 242-251``, whose skip arithmetic SURVEY.md
    flags as dubious): ``dist[c]`` = chebyshev distance to the nearest
    occupied cell, capped.

Traversal (device): ALL rays march in lockstep inside one
``lax.while_loop`` — no vmapped scalar loops.  Each iteration either tests a
W-triangle window of the current cell (one contiguous block gather + one
fused elementwise MT over the whole batch) or advances the DDA; empty
regions are crossed in a single parametric jump of ``(dist-1)`` cells
(restarting the DDA at the jumped position).  Mailboxing is dropped: min-t
reduction makes duplicate tests idempotent (vs ``Voxel_Grid.cs:29-32,
334-343, 478-480``, whose global ``assign_id()`` lock would serialize all
rays).  A hit is accepted only before the next cell boundary (the "hit
point inside the current voxel" rule, ``:496-499``, in t-form).

Unlike the reference's grid fast path (t-only, returns ``u=v=0``,
``:481-498``), real barycentrics are always returned (recomputed
differentiably in ``finalize_hits`` at the fixed hit triangle).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..geom.intersect import MIN_T, ray_aabb
from ..geom.primitives import HitRecord, Ray
from ..geom.tribox import tri_box_overlap
from ..mesh.scene import Scene
from ..mesh.topology import Topology
from .brute import _KERNELS
from .common import finalize_hits

__all__ = ["VoxelGrid", "build_voxel_grid", "shoot_grid"]

# Voxel padding factor for the SAT fill (Voxel_Grid.cs:283-285: +-0.001 voxel).
FILL_PAD = 1.001
# Epsilon nudge (in units of char_step) applied when clipping an outside ray
# to the grid entry (Voxel_Grid.cs:367-377 uses 1e-6 absolute; we scale).
ENTRY_EPS = 1e-4
# Distance-field cap (cells); larger empty regions are crossed in several hops.
DIST_CAP = 15


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "cell_start",
        "cell_tris",
        "grid_min",
        "voxel_size",
        "inst_geom",
        "inst_tri",
        "inst_poly",
        "inst_top",
        "dist_field",
    ),
    meta_fields=("dims", "char_step", "max_cell_tris"),
)
@dataclasses.dataclass(frozen=True)
class VoxelGrid:
    """Device voxel grid: CSR offsets + instance-major geometry + distance
    field.  ``dims``/``char_step``/``max_cell_tris`` are static."""

    cell_start: jnp.ndarray  # (nx*ny*nz + 1,) i32 CSR offsets
    cell_tris: jnp.ndarray  # (total,) i32 triangle ids (cell-major order)
    grid_min: jnp.ndarray  # (3,) f32
    voxel_size: jnp.ndarray  # (3,) f32
    inst_geom: jnp.ndarray  # (total + pad, 9) f32 [v0|e1|e2] per instance
    inst_tri: jnp.ndarray  # (total + pad,) i32 (= cell_tris padded with -1)
    inst_poly: jnp.ndarray  # (total + pad,) i32
    inst_top: jnp.ndarray  # (total + pad,) i32
    dist_field: jnp.ndarray  # (nx*ny*nz,) i32 chebyshev dist to occupied
    dims: Tuple[int, int, int]
    char_step: float  # min voxel dimension (Spatial_Partition.Char_Step)
    max_cell_tris: int  # max triangles in any one cell

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.dims
        return nx * ny * nz


def _fill(
    tri: np.ndarray, gmin: np.ndarray, vox: np.ndarray, dims: Tuple[int, int, int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized voxel fill: CSR (cell_start, cell_tris).

    For each triangle, candidate voxels come from its AABB footprint; a
    single batched SAT call prunes to true overlaps.  O(sum of footprint
    sizes) work with no Python-per-voxel loops.
    """
    T = len(tri)
    nx, ny, nz = dims
    lo = tri.min(axis=1)  # (T, 3)
    hi = tri.max(axis=1)
    i_lo = np.clip(
        np.floor((lo - gmin) / vox - 1e-9).astype(np.int64), 0, np.array(dims) - 1
    )
    i_hi = np.clip(
        np.floor((hi - gmin) / vox + 1e-9).astype(np.int64), 0, np.array(dims) - 1
    )
    counts = np.prod(i_hi - i_lo + 1, axis=1)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(nx * ny * nz + 1, np.int32), np.zeros(0, np.int32)

    tri_ids = np.repeat(np.arange(T), counts)
    # Enumerate each triangle's (ix, iy, iz) footprint without Python loops:
    # local linear index within the footprint box, decomposed per triangle.
    ends = np.cumsum(counts)
    local = np.arange(total) - np.repeat(ends - counts, counts)
    span = i_hi - i_lo + 1  # (T, 3)
    sy = span[tri_ids, 1]
    sz = span[tri_ids, 2]
    iz = local % sz
    iy = (local // sz) % sy
    ix = local // (sz * sy)
    cell_ijk = np.stack(
        [i_lo[tri_ids, 0] + ix, i_lo[tri_ids, 1] + iy, i_lo[tri_ids, 2] + iz], axis=1
    )

    center = gmin + (cell_ijk + 0.5) * vox
    half = np.broadcast_to(0.5 * vox * FILL_PAD, center.shape)
    keep = tri_box_overlap(tri[tri_ids], center, half)

    tri_ids = tri_ids[keep]
    cell_ijk = cell_ijk[keep]
    lin = (cell_ijk[:, 0] * ny + cell_ijk[:, 1]) * nz + cell_ijk[:, 2]
    order = np.argsort(lin, kind="stable")
    lin, tri_ids = lin[order], tri_ids[order]
    cell_counts = np.bincount(lin, minlength=nx * ny * nz)
    cell_start = np.concatenate([[0], np.cumsum(cell_counts)]).astype(np.int32)
    return cell_start, tri_ids.astype(np.int32)


def _chebyshev_distance(occ: np.ndarray, cap: int = DIST_CAP) -> np.ndarray:
    """Chebyshev distance-to-occupied over a 3-D bool grid, capped.

    Iterative 3^3 min-erosion: converges in ``cap`` sweeps.  This replaces
    the reference's six directional ``UInt16`` step tables
    (``Voxel_Grid - alt.cs:44``) with one isotropic field whose skip rule is
    provably safe: from anywhere inside a cell with dist D, the ray crosses
    at least D-1 more cell boundaries before it can enter an occupied cell.
    """
    nx, ny, nz = occ.shape
    dist = np.where(occ, 0, cap).astype(np.int32)
    for _ in range(cap):
        m = dist.copy()
        # 6-neighbour + diagonal erosion via padded min-shift (27-stencil).
        p = np.pad(dist, 1, constant_values=cap)
        view = np.lib.stride_tricks.sliding_window_view(p, (3, 3, 3))
        m = np.minimum(m, view.min(axis=(3, 4, 5)) + 1)
        if np.array_equal(m, dist):
            break
        dist = m
    return np.minimum(dist, cap)


def build_voxel_grid(
    source: Union[Topology, Sequence[Topology], Scene],
    domain: Optional[int] = None,
    max_doublings: int = 6,
    avg_polys: float = 10.0,
    pad: float = 1e-3,
) -> VoxelGrid:
    """Build the grid.  ``domain`` given -> fixed ``domain^3`` resolution
    (``Voxel_Grid.cs:48``); ``domain=None`` -> adaptive doubling until the
    mean triangles per occupied voxel < ``avg_polys`` or ``max_doublings``
    (``:128-254``)."""
    if isinstance(source, Scene):
        # NB: pulls arrays off the device — prefer the Topology path.
        real = np.asarray(source.tri_poly) != -2
        tri = np.asarray(jnp.stack(source.tri_vertices(), axis=1), np.float64)[real]
        tri_poly = np.asarray(source.tri_poly)[real]
        tri_top = np.asarray(source.tri_top)[real]
        # cell_tris indexes the unpadded prefix == scene triangle ids
        # (padding is always appended at the end).
    elif isinstance(source, Topology):
        tri = source.vertices[source.tri_v]
        tri_poly = source.tri_poly
        tri_top = np.zeros(len(tri), np.int32)
    else:
        parts, pp, tt = [], [], []
        p_off = 0
        for ti, t in enumerate(source):
            parts.append(t.vertices[t.tri_v])
            pp.append(t.tri_poly + p_off)  # same offsets as build_scene
            tt.append(np.full(t.n_tris, ti, np.int32))
            p_off += t.n_polys
        tri = np.concatenate(parts, axis=0)
        tri_poly = np.concatenate(pp)
        tri_top = np.concatenate(tt)

    gmin = tri.reshape(-1, 3).min(axis=0) - pad
    gmax = tri.reshape(-1, 3).max(axis=0) + pad
    extent = gmax - gmin

    if domain is not None:
        dims = (domain, domain, domain)
        vox = extent / np.array(dims)
        cell_start, cell_tris = _fill(tri, gmin, vox, dims)
    else:
        dims = (1, 1, 1)
        cell_start, cell_tris = None, None
        for _ in range(max_doublings + 1):
            vox = extent / np.array(dims)
            cell_start, cell_tris = _fill(tri, gmin, vox, dims)
            counts = np.diff(cell_start)
            occ = counts[counts > 0]
            if len(occ) and occ.mean() < avg_polys:
                break
            if np.prod(dims) >= 2 ** (3 * max_doublings):
                break
            dims = tuple(d * 2 for d in dims)
        vox = extent / np.array(dims)

    counts = np.diff(cell_start)

    # ---- instance-major geometry in CSR (cell-major) order, padded so a
    # full W-window gather starting at any valid instance stays in bounds.
    PADW = 64
    total = len(cell_tris)
    g = tri[cell_tris] if total else np.zeros((0, 3, 3))
    v0 = g[:, 0, :]
    inst_geom = np.zeros((total + PADW, 9), np.float32)
    if total:
        inst_geom[:total] = np.concatenate(
            [v0, g[:, 1, :] - v0, g[:, 2, :] - v0], axis=-1
        )
    inst_tri = np.full(total + PADW, -1, np.int32)
    inst_tri[:total] = cell_tris
    inst_poly = np.full(total + PADW, -2, np.int32)
    inst_poly[:total] = tri_poly[cell_tris] if total else 0
    inst_top = np.full(total + PADW, -1, np.int32)
    inst_top[:total] = tri_top[cell_tris] if total else 0

    dist = _chebyshev_distance((counts > 0).reshape(dims))

    return VoxelGrid(
        cell_start=jnp.asarray(cell_start),
        cell_tris=jnp.asarray(cell_tris),
        grid_min=jnp.asarray(gmin, jnp.float32),
        voxel_size=jnp.asarray(vox, jnp.float32),
        inst_geom=jnp.asarray(inst_geom),
        inst_tri=jnp.asarray(inst_tri),
        inst_poly=jnp.asarray(inst_poly),
        inst_top=jnp.asarray(inst_top),
        dist_field=jnp.asarray(dist.ravel()),
        dims=tuple(int(d) for d in dims),
        char_step=float(vox.min()),
        max_cell_tris=int(counts.max()) if len(counts) else 0,
    )


@partial(jax.jit, static_argnames=("kernel", "top_index", "window"))
def shoot_grid(
    scene: Scene,
    rays: Ray,
    grid: VoxelGrid,
    kernel: str = "mt",
    min_t: float = MIN_T,
    top_index: Optional[int] = None,
    window: int = 8,
) -> HitRecord:
    """Nearest-hit query via batch-lockstep 3-D DDA with empty-space skip.

    See the module docstring for the traversal design.  ``window`` (W) is
    the number of contiguous candidate instances tested per iteration.
    """
    ktest = _KERNELS[kernel]
    nx, ny, nz = grid.dims
    dims = jnp.array(grid.dims, jnp.int32)
    W = int(window)
    chunks_bound = max(1, -(-max(grid.max_cell_tris, 1) // W))
    n_steps_max = (nx + ny + nz + 3) + chunks_bound * (nx + ny + nz + 3)

    dtype = grid.inst_geom.dtype
    inf = jnp.asarray(jnp.inf, dtype)

    o = jax.lax.stop_gradient(rays.origin)  # (N, 3)
    d = jax.lax.stop_gradient(rays.direction)
    ex = rays.exclude_poly  # (N, 2)
    N = o.shape[0]

    # ---- clip to grid if outside (AABB advance, Voxel_Grid.cs:367-377)
    gmax = grid.grid_min + grid.voxel_size * dims.astype(dtype)
    inside = jnp.all((o >= grid.grid_min) & (o <= gmax), axis=-1)
    bhit, t_near, _ = ray_aabb(o, d, grid.grid_min, gmax)
    t0 = jnp.where(
        inside,
        0.0,
        jnp.where(bhit, jnp.maximum(t_near, 0.0) + ENTRY_EPS * grid.char_step, inf),
    )
    o_adv = o + t0[:, None] * d
    valid_ray = jnp.isfinite(t0)

    # ---- DDA setup (Voxel_Grid.cs:379-422), batched (N, 3)
    safe_d = jnp.where(d == 0, 1.0, d)
    step = jnp.where(d > 0, 1, jnp.where(d < 0, -1, 0)).astype(jnp.int32)
    t_delta = jnp.where(d == 0, inf, grid.voxel_size / jnp.abs(safe_d))
    min_delta = jnp.min(t_delta, axis=1)  # (N,) for the skip jump

    def locate(t_at):
        """Cell indices + per-axis t_max for the position at parameter t."""
        pos = o + t_at[:, None] * d
        cell = jnp.clip(
            jnp.floor((pos - grid.grid_min) / grid.voxel_size).astype(jnp.int32),
            0,
            dims - 1,
        )
        nxt = grid.grid_min + (cell + (d > 0)) * grid.voxel_size
        t_max = jnp.where(d == 0, inf, (nxt - o) / safe_d)
        return cell, t_max

    cell0, t_max0 = locate(t0)

    def cond(c):
        _, _, _, best_t, _, done, steps = c
        return jnp.logical_not(jnp.all(done)) & (steps < n_steps_max)

    def body(c):
        cell, t_max, chunk, best_t, best_tri, done, steps = c
        lin = (cell[:, 0] * ny + cell[:, 1]) * nz + cell[:, 2]  # (N,)
        start = grid.cell_start[lin]
        end = grid.cell_start[lin + 1]

        # ---- test a W-wide contiguous instance window of the current cell.
        base = start + chunk * W
        rows = jnp.minimum(base, grid.inst_geom.shape[0] - W)
        # (N, W, 9) gather of W consecutive rows per ray: index arithmetic
        # keeps rows contiguous so the gather is W x 36B blocks, not scattered.
        idx = rows[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        gwin = grid.inst_geom[idx]  # (N, W, 9)
        tid = grid.inst_tri[idx]
        tp = grid.inst_poly[idx]
        m = (idx >= start[:, None]) & (idx < end[:, None])
        v0 = gwin[..., 0:3]
        v1 = v0 + gwin[..., 3:6]
        v2 = v0 + gwin[..., 6:9]
        valid, t, _, _ = ktest(o[:, None, :], d[:, None, :], v0, v1, v2)
        acc = (
            m
            & valid
            & (t > min_t)
            & (tp != ex[:, 0:1])
            & (tp != ex[:, 1:2])
            & ~done[:, None]
        )
        if top_index is not None:
            acc &= grid.inst_top[idx] == top_index
        t = jnp.where(acc, t, inf)
        j = jnp.argmin(t, axis=1)
        t_min = jnp.take_along_axis(t, j[:, None], 1)[:, 0]
        tri_min = jnp.take_along_axis(tid, j[:, None], 1)[:, 0]
        better = t_min < best_t
        best_t = jnp.where(better, t_min, best_t)
        best_tri = jnp.where(better, tri_min, best_tri)

        # ---- more windows in this cell?  Stay; else advance the DDA.
        more = (base + W < end) & ~done
        t_exit = jnp.min(t_max, axis=1)
        found = best_t <= t_exit + 1e-6 * (1.0 + t_exit)

        # Normal single step along the smallest t_max axis.
        axis = jnp.argmin(t_max, axis=1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        cell_n = cell + onehot * step
        t_max_n = t_max + onehot.astype(dtype) * t_delta
        moved_ax = jnp.take_along_axis(cell_n, axis[:, None], 1)[:, 0]
        off_n = (moved_ax < 0) | (moved_ax >= dims[axis])

        # Empty-space skip: dist D >= 2 allows a parametric jump past D-1
        # boundary crossings, restarting the DDA at the jumped position.
        D = grid.dist_field[lin]
        do_jump = (D >= 2) & ~done
        t_jump = t_exit + (D.astype(dtype) - 1.0) * min_delta
        cell_j, t_max_j = locate(t_jump + 1e-4 * min_delta)
        pos_j = o + t_jump[:, None] * d
        off_j = jnp.any((pos_j < grid.grid_min) | (pos_j > gmax), axis=-1)

        advance = ~more & ~done
        cell = jnp.where(
            (advance & do_jump)[:, None],
            cell_j,
            jnp.where(advance[:, None], cell_n, cell),
        )
        t_max = jnp.where(
            (advance & do_jump)[:, None],
            t_max_j,
            jnp.where(advance[:, None], t_max_n, t_max),
        )
        off = jnp.where(do_jump, off_j, off_n) & advance
        chunk = jnp.where(more, chunk + 1, 0)
        done = done | (found & ~more) | off
        return (cell, t_max, chunk, best_t, best_tri, done, steps + 1)

    # Varying-zero seeds: under shard_map the carries must have the same
    # "varying over mesh axis" type as the per-ray updates.
    vzero = jnp.sum(o, axis=-1) * 0.0  # (N,)
    izero_v = vzero.astype(jnp.int32)
    izero = jnp.sum(izero_v)
    init = (
        cell0,
        t_max0,
        izero_v,
        jnp.full((N,), jnp.inf, dtype) + vzero,
        jnp.full((N,), -1, jnp.int32) + izero_v,
        jnp.logical_not(valid_ray),
        izero,
    )
    _, _, _, best_t, best_tri, _, _ = jax.lax.while_loop(cond, body, init)
    return finalize_hits(scene, rays, best_t, best_tri, ktest)
