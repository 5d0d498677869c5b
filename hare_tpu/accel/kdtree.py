"""KD-tree: flattened nodes + register-stack near/far plane descent.

TPU-native rebuild of ``KDTree.cs:23-633``:

Build (host NumPy):
  - split axis cycles with depth (axis = depth mod 3, ``KDTree.cs:95``),
  - split value = median of member triangle centroids along the axis
    (``:98-105``),
  - triangles straddling the plane are duplicated into both children
    (``:123-133``; membership by triangle AABB vs child halfspace),
  - recursion stops at ``max_depth`` or ``max_tris_per_node`` (``:92``).
  - Flattened arrays: ``axis/split/left`` (right = left + 1), leaves own CSR
    ranges into ``leaf_tris``.

Traversal (device): the reference walks an explicit node stack choosing the
near child by which side of the split plane the ray origin lies, pushing far
then near (``:249-356``), and — conservatively — never prunes against the
current best hit (``no early-out``, SURVEY.md C20).  Here the classic
parametric variant: each stack entry carries the node's [tmin, tmax] ray
interval, the split-plane crossing splits the interval for near/far children,
far children beyond the current best are pruned, and traversal exits early
once a leaf hit lies within the popped interval.  Same nearest-hit semantics,
strictly fewer node visits.  Mailboxing (``:46-49, 224-229``) is dropped —
min-t reduction makes duplicate tests idempotent.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..geom.intersect import MIN_T, ray_aabb
from ..geom.primitives import NO_POLY, HitRecord, Ray
from ..mesh.scene import Scene
from ..mesh.topology import Topology
from .brute import _KERNELS
from .common import finalize_hits
from .octree import _extract_tris

__all__ = ["KDTree", "build_kdtree", "shoot_kdtree"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "axis", "split", "left", "leaf_start", "leaf_count", "leaf_tris",
        "root_min", "root_max",
    ),
    meta_fields=("max_depth", "max_leaf_tris"),
)
@dataclasses.dataclass(frozen=True)
class KDTree:
    axis: jnp.ndarray  # (N,) i32 split axis; -1 for leaf
    split: jnp.ndarray  # (N,) f32 split coordinate
    left: jnp.ndarray  # (N,) i32 left child id (right = left + 1); -1 leaf
    leaf_start: jnp.ndarray  # (N,) i32
    leaf_count: jnp.ndarray  # (N,) i32
    leaf_tris: jnp.ndarray  # (M,) i32
    root_min: jnp.ndarray  # (3,) f32
    root_max: jnp.ndarray  # (3,) f32
    max_depth: int
    max_leaf_tris: int

    @property
    def n_nodes(self) -> int:
        return self.axis.shape[0]


def build_kdtree(
    source: Union[Topology, Sequence[Topology], Scene],
    max_depth: int = 16,
    max_tris_per_node: int = 12,
    pad: float = 1e-3,
) -> KDTree:
    tri = _extract_tris(source)
    lo = tri.min(axis=1)  # (T, 3) per-tri AABB
    hi = tri.max(axis=1)
    centroid = tri.mean(axis=1)
    root_min = lo.min(axis=0) - pad
    root_max = hi.max(axis=0) + pad

    axis_l, split_l, left_l = [0], [0.0], [-1]
    leaf_start_l, leaf_count_l = [0], [0]
    leaf_tris: list = []

    stack = [(0, np.arange(len(tri)), 0)]
    while stack:
        nid, ids, depth = stack.pop()
        if depth >= max_depth or len(ids) <= max_tris_per_node:
            axis_l[nid] = -1
            left_l[nid] = -1
            leaf_start_l[nid] = len(leaf_tris)
            leaf_count_l[nid] = len(ids)
            leaf_tris.extend(ids.tolist())
            continue
        ax = depth % 3  # KDTree.cs:95
        sv = float(np.median(centroid[ids, ax]))  # median centroid split
        go_left = lo[ids, ax] <= sv  # straddlers -> both (:123-133)
        go_right = hi[ids, ax] >= sv
        lids, rids = ids[go_left], ids[go_right]
        if len(lids) == len(ids) and len(rids) == len(ids):
            # Degenerate split (all straddle): make a leaf.
            axis_l[nid] = -1
            left_l[nid] = -1
            leaf_start_l[nid] = len(leaf_tris)
            leaf_count_l[nid] = len(ids)
            leaf_tris.extend(ids.tolist())
            continue
        base = len(axis_l)
        axis_l[nid] = ax
        split_l[nid] = sv
        left_l[nid] = base
        for cids in (lids, rids):
            axis_l.append(0)
            split_l.append(0.0)
            left_l.append(-1)
            leaf_start_l.append(0)
            leaf_count_l.append(0)
        stack.append((base, lids, depth + 1))
        stack.append((base + 1, rids, depth + 1))

    lc = np.asarray(leaf_count_l, np.int32)
    return KDTree(
        axis=jnp.asarray(np.asarray(axis_l, np.int32)),
        split=jnp.asarray(np.asarray(split_l, np.float32)),
        left=jnp.asarray(np.asarray(left_l, np.int32)),
        leaf_start=jnp.asarray(np.asarray(leaf_start_l, np.int32)),
        leaf_count=lc,
        leaf_tris=jnp.asarray(np.asarray(leaf_tris, np.int32)),
        root_min=jnp.asarray(root_min, jnp.float32),
        root_max=jnp.asarray(root_max, jnp.float32),
        max_depth=max_depth,
        max_leaf_tris=int(lc.max()) if len(lc) else 0,
    )


@partial(jax.jit, static_argnames=("kernel", "top_index", "chunk"))
def shoot_kdtree(
    scene: Scene,
    rays: Ray,
    tree: KDTree,
    kernel: str = "mt",
    min_t: float = MIN_T,
    top_index: Optional[int] = None,
    chunk: int = 8,
) -> HitRecord:
    """Nearest-hit via parametric KD descent, vmapped over rays."""
    ktest = _KERNELS[kernel]
    v0a, v1a, v2a = scene.tri_vertices()
    tri_poly = scene.tri_poly
    tri_top = scene.tri_top
    inf = jnp.asarray(jnp.inf, v0a.dtype)
    stack_size = tree.max_depth + 2
    n_chunks_max = max(1, -(-tree.max_leaf_tris // chunk))
    max_iters = 4 * int(tree.n_nodes) + 8

    def one_ray(o, d, ex):
        # Varying-zero seeds (see voxel.py): loop carries must match the
        # varying type of per-ray values under shard_map.
        vzero = jnp.sum(o) * 0.0
        izero = vzero.astype(jnp.int32)

        def leaf_test(nid, best):
            start = tree.leaf_start[nid]
            end = start + tree.leaf_count[nid]

            def chunk_body(ci, best):
                base = start + ci * chunk
                idx_in = base + jnp.arange(chunk, dtype=jnp.int32)
                m = idx_in < end
                tid = tree.leaf_tris[jnp.where(m, idx_in, 0)]
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

        rhit, rtmin, rtmax = ray_aabb(o, d, tree.root_min, tree.root_max)
        rtmin = jnp.maximum(rtmin, 0.0)

        # Stack entries: (node, tmin, tmax).  A separate "current node"
        # register walks down; leaves pop the stack.
        s_node = jnp.zeros(stack_size, jnp.int32) + izero
        s_tmin = jnp.full(stack_size, inf) + vzero
        s_tmax = jnp.full(stack_size, inf) + vzero
        sp = jnp.where(rhit, 1, 0)
        s_tmin = s_tmin.at[0].set(rtmin)
        s_tmax = s_tmax.at[0].set(rtmax)

        best0 = (inf + vzero, vzero, vzero, izero)

        def cond(c):
            sp, _, _, _, _, it = c
            return (sp > 0) & (it < max_iters)

        def body(c):
            sp, s_node, s_tmin, s_tmax, best, it = c
            sp = sp - 1
            nid = s_node[sp]
            tmin = s_tmin[sp]
            tmax = s_tmax[sp]

            # Descend from nid to a leaf, pushing far children:
            # inner while_loop over (nid, tmin, tmax, sp, s_node, s_tmin, s_tmax).
            def wcond(w):
                nid, tmin, tmax, sp, sn, st0, st1 = w
                return tree.axis[nid] >= 0

            def wbody(w):
                nid, tmin, tmax, sp, sn, st0, st1 = w
                ax = tree.axis[nid]
                sv = tree.split[nid]
                lch = tree.left[nid]
                dax = d[ax]
                oax = o[ax]
                has_cross = dax != 0
                safe = jnp.where(has_cross, dax, 1.0)
                t_split = jnp.where(has_cross, (sv - oax) / safe, inf)
                # near child: side of the origin (KDTree.cs:249-353); on the
                # plane, direction sign decides.
                origin_side = jnp.where(
                    oax < sv, 0, jnp.where(oax > sv, 1, jnp.where(dax >= 0, 1, 0))
                )
                near = lch + origin_side
                far = lch + (1 - origin_side)
                # Parametric case split.  A crossing at negative t means the
                # forward ray never leaves the origin side (near only); a
                # crossing before tmin means [tmin, tmax] lies wholly on the
                # far side (far only); a crossing inside the interval visits
                # near with [tmin, t_split] and pushes far with [t_split, tmax].
                fwd = has_cross & (t_split >= 0)
                far_only = fwd & (t_split <= tmin)
                both = fwd & (t_split > tmin) & (t_split < tmax)
                nxt = jnp.where(far_only, far, near)
                sn = sn.at[sp].set(jnp.where(both, far, sn[sp]))
                st0 = st0.at[sp].set(jnp.where(both, t_split, st0[sp]))
                st1 = st1.at[sp].set(jnp.where(both, tmax, st1[sp]))
                sp = sp + jnp.where(both, 1, 0)
                tmax = jnp.where(both, t_split, tmax)
                return (nxt, tmin, tmax, sp, sn, st0, st1)

            skip = best[0] <= tmin  # prune against current best
            nid, tmin, tmax, sp, s_node, s_tmin, s_tmax = jax.lax.cond(
                skip,
                lambda w: w,
                lambda w: jax.lax.while_loop(wcond, wbody, w),
                (nid, tmin, tmax, sp, s_node, s_tmin, s_tmax),
            )
            best = jax.lax.cond(
                skip, lambda b: b, lambda b: leaf_test(nid, b), best
            )
            return (sp, s_node, s_tmin, s_tmax, best, it + 1)

        init = (sp, s_node, s_tmin, s_tmax, best0, izero)
        _, _, _, _, best, _ = jax.lax.while_loop(cond, body, init)
        return best

    # Traversal is reverse-AD-opaque (while_loop); gradients come from the
    # differentiable re-evaluation in finalize_hits at fixed hit topology.
    best_t, best_u, best_v, best_tri = jax.vmap(one_ray)(
        jax.lax.stop_gradient(rays.origin),
        jax.lax.stop_gradient(rays.direction),
        rays.exclude_poly,
    )
    return finalize_hits(scene, rays, best_t, best_tri, ktest)
