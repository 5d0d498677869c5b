"""Octree: flattened node arrays + stackful front-to-back descent.

TPU-native rebuild of the live octree (``Octree - alt.cs:22-308``):

Build (host NumPy, recursive but SAT-vectorized per node):
  - cubified padded root box (``:78-85``; without the ``max + min / 2``
    operator-precedence bug noted in SURVEY.md §2 — the center really is the
    center here),
  - 8-way split at the center, children padded by 0.1 % (``:91-138``),
  - triangles replicated into every overlapping child by the SAT test
    (``:118-130``), recursion stops at ``max_depth`` or
    ``max_tris_per_node`` (``:93``).
  - Flattened to arrays: ``child_base[n]`` points at 8 contiguous children
    (-1 = leaf), leaves own a CSR range into ``leaf_tris``.

Traversal (device): the reference uses an explicit ``Stack<(node,tmin,tmax)>``
with direction-sorted child order (``ComputeTraversalOrder``, ``:286-306``)
and ``closestT`` pruning (``:210-211, 232-237``).  Here that becomes a
fixed-size register stack (arrays indexed by a stack pointer) inside a
``lax.while_loop`` — the stackless/bounded form the reference author sketched
but never shipped (the dead parametric octree, ``Octree.cs``).  Children are
pushed far-to-near so the near child pops first; nodes are slab-tested before
push; a popped node is skipped when ``best_t <= node_tmin``.

The reference's octree mailbox is allocated but its stamp check is commented
out (``Octree - alt.cs:220-222``) — duplicate leaf tests are already
idempotent under the min-t reduction, which is exactly why we drop
mailboxing everywhere (SURVEY.md §2).

Multi-topology: unlike the reference (which rebuilds and overwrites ``root``
per topology, serving only the last one — defect at ``:63-88``), all
topologies share one tree; ``top_index`` filters at leaf-test time.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple, Union, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..geom.intersect import MIN_T, ray_aabb
from ..geom.primitives import NO_POLY, HitRecord, Ray
from ..geom.tribox import tri_box_overlap
from ..mesh.scene import Scene
from ..mesh.topology import Topology
from .brute import _KERNELS
from .common import finalize_hits

__all__ = ["Octree", "build_octree", "shoot_octree"]

CHILD_PAD = 1.001  # 0.1% child box padding (Octree - alt.cs:118-130)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("node_min", "node_max", "child_base", "leaf_start", "leaf_count", "leaf_tris"),
    meta_fields=("max_depth", "max_leaf_tris"),
)
@dataclasses.dataclass(frozen=True)
class Octree:
    node_min: jnp.ndarray  # (N, 3) f32
    node_max: jnp.ndarray  # (N, 3) f32
    child_base: jnp.ndarray  # (N,) i32 — index of first of 8 children, -1 leaf
    leaf_start: jnp.ndarray  # (N,) i32 into leaf_tris (valid when leaf)
    leaf_count: jnp.ndarray  # (N,) i32
    leaf_tris: jnp.ndarray  # (M,) i32 triangle ids
    max_depth: int
    max_leaf_tris: int  # max triangles in any leaf (loop bound)

    @property
    def n_nodes(self) -> int:
        return self.node_min.shape[0]


def _extract_tris(source) -> np.ndarray:
    if isinstance(source, Scene):
        tri = np.asarray(jnp.stack(source.tri_vertices(), axis=1), np.float64)
        return tri[np.asarray(source.tri_poly) != -2]
    if isinstance(source, Topology):
        return source.vertices[source.tri_v]
    return np.concatenate([t.vertices[t.tri_v] for t in source], axis=0)


def build_octree(
    source: Union[Topology, Sequence[Topology], Scene],
    max_depth: int = 8,
    max_tris_per_node: int = 16,
    pad: float = 1e-3,
) -> Octree:
    tri = _extract_tris(source)
    lo = tri.reshape(-1, 3).min(axis=0) - pad
    hi = tri.reshape(-1, 3).max(axis=0) + pad
    # Cubify on the max dimension (Octree - alt.cs:78-85), centered.
    c = 0.5 * (lo + hi)
    half = 0.5 * (hi - lo).max()
    root_min = c - half
    root_max = c + half

    node_min, node_max = [root_min], [root_max]
    child_base, leaf_start, leaf_count = [-1], [0], [0]
    leaf_tris: list = []

    # Iterative BFS-ish build with an explicit stack of (node_id, tri_ids,
    # depth).  SAT membership is one vectorized call per node.
    stack = [(0, np.arange(len(tri)), 0)]
    while stack:
        nid, ids, depth = stack.pop()
        if depth >= max_depth or len(ids) <= max_tris_per_node:
            child_base[nid] = -1
            leaf_start[nid] = len(leaf_tris)
            leaf_count[nid] = len(ids)
            leaf_tris.extend(ids.tolist())
            continue
        nmin, nmax = node_min[nid], node_max[nid]
        ctr = 0.5 * (nmin + nmax)
        base = len(node_min)
        child_base[nid] = base
        for k in range(8):
            cmin = np.where(
                [k & 4, k & 2, k & 1], ctr, nmin
            )
            cmax = np.where([k & 4, k & 2, k & 1], nmax, ctr)
            half_k = 0.5 * (cmax - cmin) * CHILD_PAD
            keep = tri_box_overlap(tri[ids], 0.5 * (cmin + cmax), half_k)
            node_min.append(cmin)
            node_max.append(cmax)
            child_base.append(-1)
            leaf_start.append(0)
            leaf_count.append(0)
            cids = ids[keep]
            if len(cids):
                stack.append((base + k, cids, depth + 1))
            # empty children stay leaves with count 0

    lc = np.asarray(leaf_count, np.int32)
    return Octree(
        node_min=jnp.asarray(np.asarray(node_min), jnp.float32),
        node_max=jnp.asarray(np.asarray(node_max), jnp.float32),
        child_base=jnp.asarray(np.asarray(child_base, np.int32)),
        leaf_start=jnp.asarray(np.asarray(leaf_start, np.int32)),
        leaf_count=lc,
        leaf_tris=jnp.asarray(np.asarray(leaf_tris, np.int32)),
        max_depth=max_depth,
        max_leaf_tris=int(lc.max()) if len(lc) else 0,
    )


@partial(jax.jit, static_argnames=("kernel", "top_index", "chunk"))
def shoot_octree(
    scene: Scene,
    rays: Ray,
    tree: Octree,
    kernel: str = "mt",
    min_t: float = MIN_T,
    top_index: Optional[int] = None,
    chunk: int = 8,
) -> HitRecord:
    """Nearest-hit via register-stack octree descent, vmapped over rays."""
    ktest = _KERNELS[kernel]
    v0a, v1a, v2a = scene.tri_vertices()
    tri_poly = scene.tri_poly
    tri_top = scene.tri_top
    inf = jnp.asarray(jnp.inf, v0a.dtype)
    stack_size = 8 * (tree.max_depth + 1)
    n_chunks_max = max(1, -(-tree.max_leaf_tris // chunk))
    # Generous bound: every node visited at most once.
    max_iters = int(tree.n_nodes)

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

        # Stack of (node_id, tmin); root pushed if the ray hits its box.
        s_node = jnp.zeros(stack_size, jnp.int32) + izero
        s_tmin = jnp.full(stack_size, inf) + vzero
        rhit, rtmin, _ = ray_aabb(o, d, tree.node_min[0], tree.node_max[0])
        sp = jnp.where(rhit, 1, 0)
        s_tmin = s_tmin.at[0].set(jnp.maximum(rtmin, 0.0))

        best0 = (inf + vzero, vzero, vzero, izero)

        def cond(c):
            sp, _, _, _, it = c
            return (sp > 0) & (it < max_iters)

        def body(c):
            sp, s_node, s_tmin, best, it = c
            sp = sp - 1
            nid = s_node[sp]
            ntmin = s_tmin[sp]
            prune = best[0] <= ntmin  # closestT pruning (:210-211)
            cb = tree.child_base[nid]
            is_leaf = cb < 0

            def do_leaf(args):
                sp, s_node, s_tmin, best = args
                return sp, s_node, s_tmin, leaf_test(nid, best)

            def do_inner(args):
                sp, s_node, s_tmin, best = args
                # Slab-test all 8 children; push far-to-near so near pops
                # first (direction-sorted order, ComputeTraversalOrder).
                kids = cb + jnp.arange(8, dtype=jnp.int32)
                khit, ktmin, ktmax = ray_aabb(
                    o[None, :], d[None, :], tree.node_min[kids], tree.node_max[kids]
                )
                ktmin = jnp.maximum(ktmin, 0.0)
                push = khit & (ktmin < best[0]) & (tree.leaf_count[kids] + tree.child_base[kids] + 1 != 0)
                # order children by decreasing tmin (far first)
                keyv = jnp.where(push, ktmin, -inf)
                order = jnp.argsort(-keyv)  # far (large tmin) first; non-push last? no:
                # -inf sorts last under -keyv descending -> non-push at end.
                kids_o = kids[order]
                tmin_o = ktmin[order]
                push_o = push[order]
                n_push = jnp.sum(push_o)

                def push_body(i, st):
                    sp, s_node, s_tmin = st
                    do = push_o[i]
                    s_node = s_node.at[sp].set(jnp.where(do, kids_o[i], s_node[sp]))
                    s_tmin = s_tmin.at[sp].set(jnp.where(do, tmin_o[i], s_tmin[sp]))
                    return (sp + jnp.where(do, 1, 0), s_node, s_tmin)

                sp, s_node, s_tmin = jax.lax.fori_loop(
                    0, 8, push_body, (sp, s_node, s_tmin)
                )
                return sp, s_node, s_tmin, best

            def skip(args):
                return args

            sp, s_node, s_tmin, best = jax.lax.cond(
                prune,
                skip,
                lambda a: jax.lax.cond(is_leaf, do_leaf, do_inner, a),
                (sp, s_node, s_tmin, best),
            )
            return (sp, s_node, s_tmin, best, it + 1)

        init = (sp, s_node, s_tmin, best0, izero)
        _, _, _, best, _ = jax.lax.while_loop(cond, body, init)
        return best

    # Traversal is reverse-AD-opaque (while_loop); gradients come from the
    # differentiable re-evaluation in finalize_hits at fixed hit topology.
    best_t, best_u, best_v, best_tri = jax.vmap(one_ray)(
        jax.lax.stop_gradient(rays.origin),
        jax.lax.stop_gradient(rays.direction),
        rays.exclude_poly,
    )
    return finalize_hits(scene, rays, best_t, best_tri, ktest)
