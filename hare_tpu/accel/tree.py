"""Shared batched tree traversal for octree and KD-tree (TPU lockstep form).

The reference traverses both trees with per-ray recursion replaced by an
explicit ``Stack<(node, tmin, tmax)>`` (``Octree - alt.cs:196-274``,
``KDTree.cs:204-361``).  A per-ray stack machine is the wrong shape for a
TPU (it vmaps into a sea of scalar conds and dynamic-index scatters), so
both trees share this batched redesign, mirroring the voxel grid's
collect-then-test split (see ``voxel.py`` for the memory-system
measurements that force it):

Layout: one gather-row per node packs ALL K children component-major —
lane ``c*K + k`` holds component c of child k, components being
[min.xyz | max.xyz | child node id | leaf window start | leaf window
count].  K = 8 (octree) or 2 (KD-tree).  Leaf triangle lists live in the
shared 128-lane window rows (``accel/common.pack_windows``).

Traversal: ALL rays run in lockstep; each iteration pops one node per ray
(one-hot select from the per-ray register stack — no dynamic scatters),
gathers its child row (the ONE per-iteration gather), slab-tests the K
children vectorized, appends hit leaf-children's window ranges to the
candidate buffer and pushes hit internal children.  When a ray's buffer
cannot take a node's leaf windows, the node is re-pushed and the ray
pauses; the outer round loop then runs the shared batched window test and
resumes paused rays with ``best_t`` pruning (child boxes with
``tmin > best_t`` are never pushed).  Every reachable leaf is visited at
most once, duplicate triangle tests are idempotent under min-t — results
are exact, with no mailboxing (SURVEY.md §2) and no ordering requirement.

Differences from the reference, by design:
  - ``closestT`` pruning (``Octree - alt.cs:210-211``) appears as round-
    level ``best_t`` pruning rather than per-pop ordering; the KD-tree's
    missing prune (SURVEY.md §2, "full subtree visited") is thereby fixed
    for both.
  - multi-topology works (``top_index`` filter at test time) instead of the
    reference's per-topology root overwrite defect (``KDTree.cs:71-87``,
    ``Octree - alt.cs:63-88``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geom.intersect import MIN_T
from ..geom.primitives import HitRecord, Ray
from ..mesh.scene import Scene
from .brute import _KERNELS
from .common import finalize_hits, pack_windows, test_windows

__all__ = ["TreeTables", "build_tree_tables", "shoot_tree"]

# Child-row component blocks: minx,miny,minz,maxx,maxy,maxz,id,ws,nw
N_COMP = 9


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("node_rows", "win_data", "root_min", "root_max"),
    meta_fields=("branch", "max_depth", "row_width", "max_node_need"),
)
@dataclasses.dataclass(frozen=True)
class TreeTables:
    """Device tables for a K-ary spatial tree (octree K=8, KD-tree K=2)."""

    node_rows: jnp.ndarray  # (n_nodes + 1, row_width) f32 child-packed rows
    win_data: jnp.ndarray  # (n_windows + 1, 128) f32 shared window rows
    root_min: jnp.ndarray  # (3,) f32
    root_max: jnp.ndarray  # (3,) f32
    branch: int  # K
    max_depth: int
    row_width: int
    max_node_need: int  # max total leaf windows under any single node row

    @property
    def n_nodes(self) -> int:
        return self.node_rows.shape[0] - 1


def build_tree_tables(
    tri: np.ndarray,
    tri_poly: np.ndarray,
    tri_top: np.ndarray,
    child_ids: np.ndarray,  # (n_nodes, K) i64, -1 = no child
    node_min: np.ndarray,  # (n_nodes, 3)
    node_max: np.ndarray,  # (n_nodes, 3)
    leaf_lists: list,  # per node: np.ndarray of triangle ids ([] for inner)
    root: int,
    max_depth: int,
) -> TreeTables:
    """Pack a host-built tree into the gather-row device layout.

    A pseudo-root row is prepended whose only child is ``root`` so the
    traversal can treat every node uniformly (pop -> expand children).
    """
    K = child_ids.shape[1]
    n = len(node_min)
    counts = np.fromiter((len(l) for l in leaf_lists), np.int64, n)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    items = (
        np.concatenate([np.asarray(l, np.int64) for l in leaf_lists])
        if counts.sum()
        else np.zeros(0, np.int64)
    )
    win_data, win_start, n_wins = pack_windows(
        tri, tri_poly, tri_top, starts, counts, items
    )

    row_width = 32 if N_COMP * K <= 32 else 128
    # rows[i] describes node i's children; extra pseudo-root at index n.
    rows = np.zeros((n + 2, row_width), np.float32)

    def put(row_idx, slot, cid):
        base = np.arange(N_COMP) * K + slot
        vals = np.empty(N_COMP, np.float32)
        vals[0:3] = node_min[cid]
        vals[3:6] = node_max[cid]
        # child id only for internal nodes (-1 for leaves: nothing to push)
        is_inner = (child_ids[cid] >= 0).any()
        vals[6] = np.asarray(np.int32(cid if is_inner else -1)).view(np.float32)
        vals[7] = np.asarray(np.int32(win_start[cid])).view(np.float32)
        vals[8] = np.asarray(np.int32(n_wins[cid])).view(np.float32)
        rows[row_idx, base] = vals

    # default: nonexistent children get id -1, nw 0, and an inverted box.
    neg1 = np.asarray(np.int32(-1)).view(np.float32)
    for c in range(3):
        rows[:, (0 + c) * K : (0 + c) * K + K] = np.inf  # min = +inf
        rows[:, (3 + c) * K : (3 + c) * K + K] = -np.inf  # max = -inf
    rows[:, 6 * K : 7 * K] = neg1
    rows[:, 7 * K : 8 * K] = 0.0
    rows[:, 8 * K : 9 * K] = 0.0

    for i in range(n):
        for k in range(K):
            cid = child_ids[i, k]
            if cid >= 0:
                put(i, k, int(cid))
    put(n, 0, int(root))  # pseudo-root
    # rows[n+1] is the null row (all nonexistent children).

    # Worst single expansion: sum of leaf-children windows of one node.
    need = np.zeros(n + 1, np.int64)
    for i in range(n):
        for k in range(K):
            cid = child_ids[i, k]
            if cid >= 0 and not (child_ids[cid] >= 0).any():
                need[i] += n_wins[cid]
    need[n] = n_wins[root] if not (child_ids[root] >= 0).any() else 0

    return TreeTables(
        node_rows=jnp.asarray(rows),
        win_data=jnp.asarray(win_data),
        root_min=jnp.asarray(node_min[root], jnp.float32),
        root_max=jnp.asarray(node_max[root], jnp.float32),
        branch=K,
        max_depth=max_depth,
        row_width=row_width,
        max_node_need=int(need.max(initial=0)),
    )


@partial(
    jax.jit,
    static_argnames=("kernel", "top_index", "with_stats", "cap", "march"),
)
def shoot_tree(
    scene: Scene,
    rays: Ray,
    tree: TreeTables,
    kernel: str = "mt",
    min_t: float = MIN_T,
    top_index: Optional[int] = None,
    with_stats: bool = False,
    cap: int = 8,
    march: int = 16,
):
    """Nearest-hit query via lockstep collect-then-test tree traversal."""
    ktest = _KERNELS[kernel]
    K = tree.branch
    # A single node expansion must always fit the buffer, else no progress.
    C = max(int(cap), tree.max_node_need)
    null_row = tree.win_data.shape[0] - 1
    pseudo_root = tree.n_nodes - 1  # build appends it after real nodes
    # DFS stack bound: each pop adds at most K-1 net entries.
    S = (K - 1) * (tree.max_depth + 2) + 4
    # Round bound: every round pops at least one node per active ray or
    # pauses with a strictly fuller buffer; nodes are finite.
    max_rounds = tree.n_nodes

    dtype = tree.win_data.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    o = jax.lax.stop_gradient(rays.origin)
    d = jax.lax.stop_gradient(rays.direction)
    ex = rays.exclude_poly
    N = o.shape[0]

    inv_d = 1.0 / jnp.where(d == 0, jnp.asarray(1e-30, dtype), d)  # (N, 3)

    vzero = jnp.sum(o, axis=-1) * 0.0
    izero_v = vzero.astype(jnp.int32)
    izero = jnp.sum(izero_v)
    lanesC = jnp.arange(C, dtype=jnp.int32)[None, :]
    lanesS = jnp.arange(S, dtype=jnp.int32)[None, :]

    def collect(stack, sp, active, best_t, steps_cap):
        """Pop/expand until stacks empty, buffers full, or steps_cap."""

        def cond(s):
            return jnp.logical_not(jnp.all(~s[2])) & (s[6] < steps_cap)

        def body(s):
            stack, sp, running, buf, cnt, iters, steps = s
            # ---- pop via one-hot select (no dynamic gathers on (N, S)).
            top_oh = lanesS == (sp - 1)[:, None]
            nid = jnp.sum(jnp.where(top_oh, stack, 0), axis=1)
            row = tree.node_rows[jnp.where(running, nid, tree.n_nodes)]

            # ---- vectorized K-child slab test from component blocks.
            blk = [row[:, c * K : (c + 1) * K] for c in range(N_COMP)]
            bmin = blk[0:3]
            bmax = blk[3:6]
            cid = jax.lax.bitcast_convert_type(blk[6], jnp.int32)
            ws = jax.lax.bitcast_convert_type(blk[7], jnp.int32)
            nw = jax.lax.bitcast_convert_type(blk[8], jnp.int32)

            t_lo = jnp.full((N, K), -jnp.inf, dtype)
            t_hi = jnp.full((N, K), jnp.inf, dtype)
            for c in range(3):
                t1 = (bmin[c] - o[:, c : c + 1]) * inv_d[:, c : c + 1]
                t2 = (bmax[c] - o[:, c : c + 1]) * inv_d[:, c : c + 1]
                t_lo = jnp.maximum(t_lo, jnp.minimum(t1, t2))
                t_hi = jnp.minimum(t_hi, jnp.maximum(t1, t2))
            tmin = jnp.maximum(t_lo, 0.0)
            hit = (t_hi >= tmin) & (t_hi >= 0.0) & (tmin <= best_t[:, None])

            leaf_hit = hit & (nw > 0)
            push_hit = hit & (cid >= 0)

            # ---- buffer capacity check: whole node expands or none of it.
            need = jnp.sum(jnp.where(leaf_hit, nw, 0), axis=1)
            fits = cnt + need <= C
            expand = running & fits  # else: pause, node stays on stack

            # ---- append leaf-children window ranges (K sequential selects).
            off = cnt
            for k in range(K):
                take = expand & leaf_hit[:, k]
                w_k = nw[:, k]
                sel = take[:, None] & (lanesC >= off[:, None]) & (
                    lanesC < (off + w_k)[:, None]
                )
                buf = jnp.where(sel, ws[:, k : k + 1] + (lanesC - off[:, None]), buf)
                off = off + jnp.where(take, w_k, 0)
            cnt = jnp.where(expand, off, cnt)

            # ---- pop the node and push internal hit children.
            sp = jnp.where(expand, sp - 1, sp)
            for k in range(K):
                do = expand & push_hit[:, k]
                slot = lanesS == sp[:, None]
                stack = jnp.where(
                    (do[:, None] & slot), cid[:, k : k + 1], stack
                )
                sp = sp + do.astype(jnp.int32)

            running = running & expand & (sp > 0)
            iters = iters + running.astype(jnp.int32)
            return (stack, sp, running, buf, cnt, iters, steps + 1)

        init = (
            stack, sp, active & (sp > 0),
            jnp.full((N, C), null_row, jnp.int32) + izero_v[:, None],
            izero_v,
            izero_v,
            izero,
        )
        stack, sp, running, buf, cnt, iters, _ = jax.lax.while_loop(
            cond, body, init
        )
        return stack, sp, buf, iters

    def r_cond(c):
        return jnp.logical_not(jnp.all(c[2])) & (c[5] < max_rounds)

    def r_body(c):
        stack, sp, done, best_t, best_tri, rounds, iters = c
        stack, sp, buf, it1 = collect(stack, sp, ~done, best_t, march)
        best_t, best_tri = test_windows(
            tree.win_data, buf, o, d, ex, ~done, best_t, best_tri,
            min_t, top_index,
        )
        done = done | (sp == 0)
        return (stack, sp, done, best_t, best_tri, rounds + 1, iters + it1)

    stack0 = jnp.full((N, S), 0, jnp.int32) + izero_v[:, None]
    stack0 = jnp.where(lanesS == 0, pseudo_root, stack0)
    sp0 = izero_v + 1
    init = (
        stack0,
        sp0,
        izero_v < 0,  # done
        jnp.full((N,), jnp.inf, dtype) + vzero,
        jnp.full((N,), -1, jnp.int32) + izero_v,
        izero,
        izero_v,
    )
    out = jax.lax.while_loop(r_cond, r_body, init)
    best_t, best_tri, iters = out[3], out[4], out[6]
    hits = finalize_hits(scene, rays, best_t, best_tri, ktest)
    if with_stats:
        return hits, iters
    return hits
