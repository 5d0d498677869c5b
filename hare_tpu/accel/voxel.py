"""Uniform voxel grid with 3-D DDA traversal (the primary accel structure).

TPU-native rebuild of ``Voxel_Grid`` (``Voxel_Grid.cs:27-792``, "concept
based on Amanatides" — Amanatides & Woo 1987):

Build (host, vectorized NumPy — replaces the thread-per-core fill with
100 ms sleep-join polling, ``Voxel_Grid.cs:92-120``):
  - fixed ``domain^3`` grid over the padded model AABB (``:48-121``), or the
    adaptive ctor's criterion: keep doubling per-axis resolution until the
    average triangle count per *occupied* voxel drops below ``avg_polys`` or
    ``max_doublings`` is reached (``:128-254``).
  - membership by the same SAT triangle/box test (``AABB_Tri_Int.cs``) with
    the reference's 0.1% voxel padding (``Voxel_Grid.cs:283-285``), stored as
    CSR: ``cell_start[nx*ny*nz + 1]`` + ``cell_tris[total]``.

Traversal (device, ``lax.while_loop`` under vmap — later a Pallas kernel):
  - locate the origin voxel (``:355-359``); rays starting outside the grid
    are advanced to the slab entry point + epsilon nudge (``:367-377``).
  - per-axis ``step/t_max/t_delta`` DDA state (``:379-422``).
  - march: test every triangle in the cell (min-t reduction makes duplicate
    tests across cells idempotent — this replaces the reference's mailboxing
    machinery, ``:29-32, 334-343, 478-480``, whose global ``assign_id()``
    lock would serialize everything); accept a hit only if it lies before
    the next cell boundary (the "hit point inside the current voxel" rule,
    ``:496-499``, expressed in t rather than by re-testing the point);
    otherwise advance the smallest ``t_max`` axis and exit on grid departure
    (``:504-551``).

Unlike the reference's grid fast path (t-only, returns ``u=v=0``,
``:481-498``), real barycentrics are always returned.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..geom.intersect import MIN_T, ray_aabb, ray_triangle_mt, ray_triangle_watertight
from ..geom.primitives import NO_POLY, HitRecord, Ray
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


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("cell_start", "cell_tris", "grid_min", "voxel_size"),
    meta_fields=("dims", "char_step", "max_cell_tris"),
)
@dataclasses.dataclass(frozen=True)
class VoxelGrid:
    """Device CSR voxel grid.  ``dims`` etc. are static (compile-time)."""

    cell_start: jnp.ndarray  # (nx*ny*nz + 1,) i32
    cell_tris: jnp.ndarray  # (total,) i32 triangle ids
    grid_min: jnp.ndarray  # (3,) f32
    voxel_size: jnp.ndarray  # (3,) f32
    dims: Tuple[int, int, int]
    char_step: float  # min voxel dimension (Spatial_Partition.Char_Step)
    max_cell_tris: int  # max triangles in any one cell (loop bound)

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
    i_lo = np.clip(np.floor((lo - gmin) / vox - 1e-9).astype(np.int64), 0, np.array(dims) - 1)
    i_hi = np.clip(np.floor((hi - gmin) / vox + 1e-9).astype(np.int64), 0, np.array(dims) - 1)
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
        tri = np.asarray(
            jnp.stack(source.tri_vertices(), axis=1), np.float64
        )  # includes padding tris (degenerate at origin) — drop them
        real = np.asarray(source.tri_poly) != -2
        tri = tri[real]
        # NB: cell_tris then indexes into the *unpadded* prefix, which matches
        # scene triangle ids because padding is always appended at the end.
    elif isinstance(source, Topology):
        tri = source.vertices[source.tri_v]
    else:
        offs, parts = 0, []
        for t in source:
            parts.append(t.vertices[t.tri_v])
            offs += t.n_vertices
        tri = np.concatenate(parts, axis=0)

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
    return VoxelGrid(
        cell_start=jnp.asarray(cell_start),
        cell_tris=jnp.asarray(cell_tris),
        grid_min=jnp.asarray(gmin, jnp.float32),
        voxel_size=jnp.asarray(vox, jnp.float32),
        dims=tuple(int(d) for d in dims),
        char_step=float(vox.min()),
        max_cell_tris=int(counts.max()) if len(counts) else 0,
    )


@partial(jax.jit, static_argnames=("kernel", "top_index", "chunk"))
def shoot_grid(
    scene: Scene,
    rays: Ray,
    grid: VoxelGrid,
    kernel: str = "mt",
    min_t: float = MIN_T,
    top_index: Optional[int] = None,
    chunk: int = 8,
) -> HitRecord:
    """Nearest-hit query via 3-D DDA grid marching.  vmapped over rays."""
    ktest = _KERNELS[kernel]
    nx, ny, nz = grid.dims
    dims = jnp.array(grid.dims, jnp.int32)
    n_steps_max = nx + ny + nz + 3
    n_chunks_max = max(1, -(-grid.max_cell_tris // chunk))

    v0a, v1a, v2a = scene.tri_vertices()
    tri_poly = scene.tri_poly
    tri_top = scene.tri_top
    inf = jnp.asarray(jnp.inf, v0a.dtype)

    def one_ray(o, d, ex):
        # Varying-zero seeds: under shard_map the loop carries must have the
        # same "varying over mesh axis" type as the per-ray updates, so all
        # inits derive from the (varying) ray inputs instead of constants.
        vzero = jnp.sum(o) * 0.0
        izero = vzero.astype(jnp.int32)
        # ---- clip to grid if outside (AABB advance, Voxel_Grid.cs:367-377)
        gmax = grid.grid_min + grid.voxel_size * dims.astype(v0a.dtype)
        inside = jnp.all((o >= grid.grid_min) & (o <= gmax))
        bhit, t_near, _ = ray_aabb(o, d, grid.grid_min, gmax)
        t0 = jnp.where(
            inside, 0.0, jnp.where(bhit, jnp.maximum(t_near, 0.0) + ENTRY_EPS * grid.char_step, inf)
        )
        o_adv = o + t0 * d
        valid_ray = jnp.isfinite(t0)

        # ---- DDA setup (Voxel_Grid.cs:379-422)
        cell = jnp.clip(
            jnp.floor((o_adv - grid.grid_min) / grid.voxel_size).astype(jnp.int32),
            0,
            dims - 1,
        )
        step = jnp.where(d > 0, 1, jnp.where(d < 0, -1, 0)).astype(jnp.int32)
        # Parallel axes: t_max/t_delta = +inf so they never advance.
        safe_d = jnp.where(d == 0, 1.0, d)
        next_bound = grid.grid_min + (cell + jnp.where(d > 0, 1, 0)) * grid.voxel_size
        t_max = jnp.where(d == 0, inf, (next_bound - o) / safe_d)
        t_delta = jnp.where(d == 0, inf, grid.voxel_size / jnp.abs(safe_d))

        def cell_tests(cell, best):
            """Test all triangles in `cell`, chunked; min-t reduction."""
            lin = (cell[0] * ny + cell[1]) * nz + cell[2]
            start = grid.cell_start[lin]
            end = grid.cell_start[lin + 1]

            def chunk_body(ci, best):
                base = start + ci * chunk
                idx_in = base + jnp.arange(chunk, dtype=jnp.int32)
                m = idx_in < end
                tid = grid.cell_tris[jnp.where(m, idx_in, 0)]
                valid, t, u, v = ktest(o, d, v0a[tid], v1a[tid], v2a[tid])
                tp = tri_poly[tid]
                acc = m & valid & (t > min_t) & (tp != ex[0]) & (tp != ex[1])
                if top_index is not None:
                    acc &= tri_top[tid] == top_index
                t = jnp.where(acc, t, inf)
                j = jnp.argmin(t)
                cand = (t[j], u[j], v[j], tid[j])
                better = cand[0] < best[0]
                return tuple(jnp.where(better, c, b) for c, b in zip(cand, best))

            n_chunks = jnp.maximum(0, -(-(end - start) // chunk))
            return jax.lax.fori_loop(
                0, jnp.minimum(n_chunks, n_chunks_max), chunk_body, best
            )

        def cond(c):
            cell, t_max_c, best, steps, done = c
            return jnp.logical_not(done) & (steps < n_steps_max)

        def body(c):
            cell, t_max_c, best, steps, done = c
            best = cell_tests(cell, best)
            t_exit = jnp.min(t_max_c)
            # Accept only hits within this cell (t <= exit boundary + eps)
            found = best[0] <= t_exit + 1e-6 * (1.0 + t_exit)
            axis = jnp.argmin(t_max_c)
            cell2 = cell.at[axis].add(step[axis])
            t_max2 = t_max_c.at[axis].add(t_delta[axis])
            off = (cell2[axis] < 0) | (cell2[axis] >= dims[axis])
            return (cell2, t_max2, best, steps + 1, found | off)

        best0 = (inf + vzero, vzero, vzero, izero)
        init = (cell, t_max, best0, izero, jnp.logical_not(valid_ray))
        _, _, best, _, _ = jax.lax.while_loop(cond, body, init)
        return best

    # Traversal is reverse-AD-opaque (while_loop); gradients come from the
    # differentiable re-evaluation in finalize_hits at fixed hit topology.
    best_t, best_u, best_v, best_tri = jax.vmap(one_ray)(
        jax.lax.stop_gradient(rays.origin),
        jax.lax.stop_gradient(rays.direction),
        rays.exclude_poly,
    )
    return finalize_hits(scene, rays, best_t, best_tri, ktest)
