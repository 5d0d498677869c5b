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

    # default: nonexistent children get id -1, nw 0, and an inverted box.
    neg1 = np.asarray(np.int32(-1)).view(np.float32)
    for c in range(3):
        rows[:, (0 + c) * K : (0 + c) * K + K] = np.inf  # min = +inf
        rows[:, (3 + c) * K : (3 + c) * K + K] = -np.inf  # max = -inf
    rows[:, 6 * K : 7 * K] = neg1
    rows[:, 7 * K : 8 * K] = 0.0
    rows[:, 8 * K : 9 * K] = 0.0

    # Vectorized fill over all real (parent, slot, child) edges, plus the
    # pseudo-root edge (n, 0, root) appended at the end.
    is_inner = (child_ids >= 0).any(axis=1)  # (n,)
    p_idx, k_idx = np.nonzero(child_ids >= 0)
    cids = child_ids[p_idx, k_idx]
    p_idx = np.concatenate([p_idx, [n]])
    k_idx = np.concatenate([k_idx, [0]])
    cids = np.concatenate([cids, [root]]).astype(np.int64)
    for c in range(3):
        rows[p_idx, c * K + k_idx] = node_min[cids, c]
        rows[p_idx, (3 + c) * K + k_idx] = node_max[cids, c]
    # child id only for internal nodes (-1 for leaves: nothing to push)
    rows[p_idx, 6 * K + k_idx] = np.where(
        is_inner[cids], cids, -1
    ).astype(np.int32).view(np.float32)
    rows[p_idx, 7 * K + k_idx] = win_start[cids].astype(np.int32).view(
        np.float32
    )
    rows[p_idx, 8 * K + k_idx] = n_wins[cids].astype(np.int32).view(
        np.float32
    )
    # rows[n+1] is the null row (all nonexistent children).

    # Worst single expansion: sum of leaf-children windows of one node row.
    need = np.zeros(n + 1, np.int64)
    np.add.at(need, p_idx, np.where(is_inner[cids], 0, n_wins[cids]))

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
    static_argnames=(
        "kernel", "top_index", "with_stats", "cap", "march", "ordered",
    ),
)
def shoot_tree(
    scene: Scene,
    rays: Ray,
    tree: TreeTables,
    kernel: str = "watertight",
    min_t: float = MIN_T,
    top_index: Optional[int] = None,
    with_stats: bool = False,
    cap: int = 8,
    march: int = 32,
    ordered: bool = False,
):
    """Nearest-hit query via lockstep collect-then-test tree traversal."""
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

    def collect(stack, stmin, sp, active, best_t, steps_cap):
        """Pop/expand until stacks empty, buffers full, or steps_cap.

        Front-to-back: children are pushed in DESCENDING-tmin order (nearest
        pops first — the lockstep analog of ``ComputeTraversalOrder``,
        ``Octree - alt.cs:286-306``), and each stack entry carries its tmin
        in a parallel register stack so pops prune against ``best_t`` inside
        the loop (``closestT <= nodeTmin``, ``Octree - alt.cs:210-211``).
        """

        def cond(s):
            return jnp.logical_not(jnp.all(~s[3])) & (s[7] < steps_cap)

        def body(s):
            stack, stmin, sp, running, buf, cnt, iters, steps = s
            # ---- pop via one-hot select (no dynamic gathers on (N, S)).
            top_oh = lanesS == (sp - 1)[:, None]
            nid = jnp.sum(jnp.where(top_oh, stack, 0), axis=1)
            node_tmin = jnp.sum(jnp.where(top_oh, stmin, 0.0), axis=1)
            # Pop-time prune: a node entered beyond the best hit is discarded
            # without expansion (its row gather is redirected to the null row).
            pruned = running & (node_tmin > best_t)
            row = tree.node_rows[
                jnp.where(running & ~pruned, nid, tree.n_nodes)
            ]

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
            # Pruned pops consume no buffer; they always "expand" (to pop).
            expand = running & (fits | pruned)

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

            # ---- pop the node and push internal hit children far-to-near:
            # sort by descending tmin so the NEAREST child is on top of the
            # stack and pops first — best_t then tightens soonest.
            sp = jnp.where(expand, sp - 1, sp)
            if ordered and K > 1:
                # Front-to-back push ordering (``ComputeTraversalOrder``,
                # ``Octree - alt.cs:286-306``).  Measured on TPU: the
                # in-loop sort/shuffle costs 2-3x more than the pops it
                # saves — pop-time tmin pruning above already captures the
                # benefit (identical iteration counts on the bench scene) —
                # so ordering is OFF by default and kept as a knob for
                # extremely divergence-heavy scenes.
                key = jnp.where(push_hit, tmin, -jnp.inf)
                order = jnp.argsort(-key, axis=1)
                cid_p = jnp.take_along_axis(cid, order, 1)
                push_p = jnp.take_along_axis(push_hit, order, 1)
                tmin_p = jnp.take_along_axis(tmin, order, 1)
            else:
                cid_p, push_p, tmin_p = cid, push_hit, tmin
            for k in range(K):
                do = expand & push_p[:, k]
                slot = do[:, None] & (lanesS == sp[:, None])
                stack = jnp.where(slot, cid_p[:, k : k + 1], stack)
                stmin = jnp.where(slot, tmin_p[:, k : k + 1], stmin)
                sp = sp + do.astype(jnp.int32)

            running = running & expand & (sp > 0)
            iters = iters + running.astype(jnp.int32)
            return (stack, stmin, sp, running, buf, cnt, iters, steps + 1)

        init = (
            stack, stmin, sp, active & (sp > 0),
            jnp.full((N, C), null_row, jnp.int32) + izero_v[:, None],
            izero_v,
            izero_v,
            izero,
        )
        stack, stmin, sp, running, buf, cnt, iters, _ = jax.lax.while_loop(
            cond, body, init
        )
        return stack, stmin, sp, buf, iters

    def r_cond(c):
        return jnp.logical_not(jnp.all(c[3])) & (c[6] < max_rounds)

    def r_body(c):
        stack, stmin, sp, done, best_t, best_tri, rounds, iters = c
        stack, stmin, sp, buf, it1 = collect(
            stack, stmin, sp, ~done, best_t, march
        )
        best_t, best_tri = test_windows(
            tree.win_data, buf, o, d, ex, ~done, best_t, best_tri,
            min_t, top_index, kernel=kernel,
        )
        done = done | (sp == 0)
        return (
            stack, stmin, sp, done, best_t, best_tri, rounds + 1,
            iters + it1,
        )

    stack0 = jnp.full((N, S), 0, jnp.int32) + izero_v[:, None]
    stack0 = jnp.where(lanesS == 0, pseudo_root, stack0)
    stmin0 = jnp.zeros((N, S), dtype) + vzero[:, None]
    sp0 = izero_v + 1
    init = (
        stack0,
        stmin0,
        sp0,
        izero_v < 0,  # done
        jnp.full((N,), jnp.inf, dtype) + vzero,
        jnp.full((N,), -1, jnp.int32) + izero_v,
        izero,
        izero_v,
    )
    out = jax.lax.while_loop(r_cond, r_body, init)
    best_t, best_tri, iters = out[4], out[5], out[7]
    hits = finalize_hits(scene, rays, best_t, best_tri, kernel)
    if with_stats:
        return hits, iters
    return hits
