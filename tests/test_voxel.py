"""Voxel grid: build correctness + DDA agreement with brute force."""

import numpy as np
import jax
import jax.numpy as jnp

from hare_tpu.geom import Ray
from hare_tpu.accel import build_voxel_grid, shoot_brute, shoot_grid
from hare_tpu.mesh import Topology, build_scene, shapes


def agree(sc, grid, o, d, ex=None, **kw):
    rays = Ray.make(
        jnp.asarray(o, jnp.float32),
        jnp.asarray(d, jnp.float32),
        None if ex is None else jnp.asarray(ex, jnp.int32),
    )
    hb = jax.tree.map(np.asarray, shoot_brute(sc, rays, **kw))
    hg = jax.tree.map(np.asarray, shoot_grid(sc, rays, grid, **kw))
    np.testing.assert_array_equal(hb.hit, hg.hit)
    h = hb.hit
    np.testing.assert_allclose(hb.t[h], hg.t[h], rtol=1e-5, atol=1e-6)
    # Same polygon unless two tris tie at the same t (coplanar overlap).
    same = hb.tri_id[h] == hg.tri_id[h]
    ties = np.abs(hb.t[h] - hg.t[h]) < 1e-5
    assert (same | ties).all()
    return hb, hg


def rand_dirs(rng, n):
    d = rng.normal(0, 1, (n, 3))
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def _decode(grid):
    """Per-cell triangle-id lists from the packed window layout."""
    meta = np.asarray(grid.cell_meta)
    wd = np.asarray(grid.win_data)
    from hare_tpu.accel.common import WIN
    tids = wd[:, 9 * WIN : 10 * WIN].view(np.int32)
    out = []
    for c in range(meta.shape[0]):
        start, nw = meta[c, 0], meta[c, 1] >> 8
        ids = tids[start : start + nw].ravel()
        out.append(ids[ids >= 0])
    return out


def test_grid_build_shoebox():
    top = Topology.build(shapes.shoebox(4, 5, 3))
    grid = build_voxel_grid(top, domain=4)
    assert grid.dims == (4, 4, 4)
    assert grid.n_cells == 64
    cells = _decode(grid)
    # every wall triangle appears in at least one cell
    assert set(np.concatenate(cells).tolist()) == set(range(12))
    # dist==0 exactly for occupied cells
    dist = np.asarray(grid.cell_meta)[:, 1] & 0xFF
    occ = np.array([len(c) > 0 for c in cells])
    np.testing.assert_array_equal(dist == 0, occ)
    assert grid.char_step > 0


def test_grid_adaptive():
    top = Topology.build(shapes.concert_hall())
    grid = build_voxel_grid(top, domain=None, max_doublings=5, avg_polys=16.0)
    counts = np.array([len(c) for c in _decode(grid)])
    occ = counts[counts > 0]
    # adaptive criterion reached (or the doubling cap)
    assert occ.mean() < 16.0 or grid.dims[0] == 32
    from hare_tpu.accel.common import WIN as _W
    assert grid.max_cell_wins == -(-counts.max() // _W)


def test_adaptive_refine_matches_full_fill():
    """Parent-membership-pruned doubling (_refine_fill) produces exactly
    the same CSR membership as a from-scratch fill at the fine level —
    pruning is exact because padded child boxes nest inside padded parent
    boxes (Voxel_Grid.cs:208-215 parity, r5)."""
    from hare_tpu.accel.voxel import _fill, _refine_fill

    top = Topology.build(shapes.random_soup(200, seed=9))
    tri = top.vertices[top.tri_v]
    gmin = tri.reshape(-1, 3).min(axis=0) - 1e-3
    gmax = tri.reshape(-1, 3).max(axis=0) + 1e-3
    extent = gmax - gmin
    for coarse, fine in (((1, 1, 1), (2, 2, 2)), ((2, 2, 2), (4, 4, 4)),
                         ((4, 4, 4), (8, 8, 8))):
        ps, pt = _fill(tri, gmin, extent / np.array(coarse), coarse)
        full_s, full_t = _fill(tri, gmin, extent / np.array(fine), fine)
        ref_s, ref_t = _refine_fill(
            tri, gmin, extent / np.array(fine), fine, ps, pt, coarse
        )
        np.testing.assert_array_equal(full_s, ref_s)
        np.testing.assert_array_equal(full_t, ref_t)


def test_grid_agreement_shoebox(rng):
    top = Topology.build(shapes.shoebox(4, 5, 3))
    sc = top.scene()
    grid = build_voxel_grid(top, domain=4)
    o = rng.uniform((0.2, 0.2, 0.2), (3.8, 4.8, 2.8), (300, 3))
    agree(sc, grid, o, rand_dirs(rng, 300))


def test_grid_agreement_outside_rays(rng):
    """Rays starting outside the grid get clipped to the entry point."""
    top = Topology.build(shapes.icosphere(2))
    sc = top.scene()
    grid = build_voxel_grid(top, domain=8)
    o = rng.uniform(-4, 4, (200, 3))
    o[np.linalg.norm(o, axis=1) < 1.5] *= 3.0  # push outside
    # aim toward the sphere so many enter the grid
    d = -o + rng.normal(0, 0.3, (200, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hb, _ = agree(sc, grid, o, d)
    assert np.asarray(hb.hit).sum() > 50


def test_grid_agreement_soup(rng):
    top = Topology.build(shapes.random_soup(300, seed=11))
    sc = top.scene()
    grid = build_voxel_grid(top, domain=None, avg_polys=8.0)
    o = rng.uniform(-1, 11, (300, 3))
    agree(sc, grid, o, rand_dirs(rng, 300))


def test_grid_exclusion(rng):
    top = Topology.build(shapes.shoebox())
    sc = top.scene()
    grid = build_voxel_grid(top, domain=4)
    o = rng.uniform((0.5, 0.5, 0.5), (3.5, 4.5, 2.5), (100, 3))
    d = rand_dirs(rng, 100)
    # First find hits without exclusion, then exclude each hit polygon.
    rays = Ray.make(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    h0 = shoot_grid(sc, rays, grid)
    ex = np.stack([np.asarray(h0.poly_id), np.full(100, -1)], axis=1)
    hb, hg = agree(sc, grid, o, d, ex=ex)
    # excluded polygon never returned
    assert (np.asarray(hg.poly_id)[np.asarray(hg.hit)] != ex[np.asarray(hg.hit), 0]).all()


def test_grid_in_bounce_loop(rng):
    """The grid backend slots into trace_rays like brute force."""
    from functools import partial
    from hare_tpu.trace import trace_rays

    top = Topology.build(shapes.shoebox(4, 5, 3))
    sc = top.scene()
    grid = build_voxel_grid(top, domain=4)
    a = jnp.full(top.n_polys, 0.3, jnp.float32)
    o = np.tile(np.array([2.0, 2.5, 1.5], np.float32), (64, 1))
    d = rand_dirs(rng, 64).astype(np.float32)
    rays = Ray.make(o, d)
    shoot_fn = partial(shoot_grid, grid=grid)
    res_g = trace_rays(sc, rays, a, 4, shoot_fn)
    res_b = trace_rays(sc, rays, a, 4, shoot_brute)
    np.testing.assert_array_equal(np.asarray(res_g.hit), np.asarray(res_b.hit))
    np.testing.assert_allclose(
        np.asarray(res_g.energy), np.asarray(res_b.energy), rtol=1e-5
    )


def test_grid_multi_topology(rng):
    t1 = Topology.build(shapes.shoebox())
    t2 = Topology.build(shapes.icosphere(1, radius=0.8, center=(2.0, 2.5, 1.5)))
    sc = build_scene([t1, t2])
    grid = build_voxel_grid(sc, domain=8)
    o = rng.uniform((0.5, 0.5, 0.5), (3.5, 4.5, 2.5), (100, 3))
    d = rand_dirs(rng, 100)
    agree(sc, grid, o, d)
    # restricted to topology 0 also agrees
    agree(sc, grid, o, d, top_index=0)


def test_grid_per_topology_build(rng):
    """only_top builds a per-topology grid whose rows carry GLOBAL ids —
    the reference's 4-D Voxel_Inv per-topology lists (Voxel_Grid.cs:83):
    a filtered shoot over it equals the combined grid's test-time filter
    and brute force, for both topologies."""
    from hare_tpu.geom import Ray as _Ray
    from hare_tpu.accel import SpatialPartition

    t1 = Topology.build(shapes.shoebox())
    t2 = Topology.build(shapes.icosphere(1, radius=0.8, center=(2.0, 2.5, 1.5)))
    sc = build_scene([t1, t2])
    o = rng.uniform((0.5, 0.5, 0.5), (3.5, 4.5, 2.5), (100, 3))
    d = rand_dirs(rng, 100)
    for ti in (0, 1):
        g_top = build_voxel_grid(sc, domain=8, only_top=ti)
        # the per-top grid needs NO test-time top filter — its rows hold
        # only that topology's triangles (with global ids)
        rays = _Ray.make(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
        h_top = jax.tree.map(np.asarray, shoot_grid(sc, rays, g_top))
        h_brute = jax.tree.map(
            np.asarray, shoot_brute(sc, rays, top_index=ti)
        )
        np.testing.assert_array_equal(h_top.hit, h_brute.hit)
        h = h_top.hit
        np.testing.assert_allclose(h_top.t[h], h_brute.t[h], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(h_top.poly_id[h], h_brute.poly_id[h])

    # facade path: SpatialPartition.shoot(top_index=...) builds and caches
    # the per-topology grid lazily
    sp = SpatialPartition([t1, t2], accel="grid", domain=8)
    h_f = jax.tree.map(np.asarray, sp.shoot(
        _Ray.make(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)),
        top_index=1,
    ))
    h_b = jax.tree.map(np.asarray, shoot_brute(
        sp.scene,
        _Ray.make(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)),
        top_index=1,
    ))
    np.testing.assert_array_equal(h_f.hit, h_b.hit)
    assert 1 in sp._top_grids  # cached

    # Out-of-range topology index must return all-miss (pre-r5 behavior),
    # not raise from the per-topology build.
    h_none = sp.shoot(
        _Ray.make(jnp.asarray(o[:8], jnp.float32), jnp.asarray(d[:8], jnp.float32)),
        top_index=5,
    )
    assert not np.asarray(h_none.hit).any()


def test_grid_boundary_origin_parallel_ray():
    """Origin exactly ON the grid's min-x face, direction parallel to it.

    Pre-r4, ``ray_aabb`` produced 0 * inf = NaN on the parallel axis, the
    clip marked the ray invalid, and it silently never traced (VERDICT r3
    weak item 3).  With ``pad=0`` the grid face coincides with the shoebox
    x=0 wall plane, so the ray rides that plane from outside (y < 0) and
    must still find the y=0 wall edge hit that brute force finds.
    """
    top = Topology.build(shapes.shoebox(4, 5, 3))
    sc = top.scene()
    grid = build_voxel_grid(top, domain=4, pad=0.0)
    assert float(np.asarray(grid.grid_min)[0]) == 0.0
    o = np.array([[0.0, -1.0, 1.5]], np.float32)  # x exactly on the face
    d = np.array([[0.0, 1.0, 0.0]], np.float32)  # parallel to that face
    hb, hg = agree(sc, grid, o, d)
    assert bool(np.asarray(hb.hit)[0])  # the ray really does hit (y=0 wall)
    np.testing.assert_allclose(np.asarray(hg.t)[0], 1.0, rtol=1e-5)


def test_grid_win_override():
    """``win=`` reaches pack_windows (ADVICE r3: silent no-op before)."""
    top = Topology.build(shapes.concert_hall())
    g8 = build_voxel_grid(top, domain=8, win=8)
    g16 = build_voxel_grid(top, domain=8)
    assert g8.win_data.shape[1] == 12 * 8
    assert g16.win_data.shape[1] == 12 * 16
    sc = top.scene()
    rng = np.random.default_rng(5)
    o = rng.uniform((2, 2, 1), (28, 48, 16), (64, 3))
    agree(sc, g8, o, rand_dirs(rng, 64))


def test_chunked_test_windows_non_divisible(monkeypatch, rng):
    """Ray counts not divisible by the chunk count still go through the
    memory-bounded lax.map path (ADVICE r3: silent full-width fallback)."""
    from hare_tpu.accel import common

    monkeypatch.setattr(common, "TEST_CHUNK", 64)
    top = Topology.build(shapes.shoebox(4, 5, 3))
    sc = top.scene()
    grid = build_voxel_grid(top, domain=4)
    n = 131  # 131 rays / chunk 64 -> 3 chunks of 44, one lane padded
    o = rng.uniform((0.2, 0.2, 0.2), (3.8, 4.8, 2.8), (n, 3))
    agree(sc, grid, o, rand_dirs(rng, n))


def test_grid_tier_caps_agreement(rng):
    """r5 deep-tail knobs (``tier`` compacted high-slot arm, ``cap_s``
    deeper straggler buffer) preserve exactness — results must equal the
    default path and brute force even when the knobs force the compact /
    resume machinery (tiny tier, tiny cap)."""
    top = Topology.build(shapes.random_soup(300, seed=17))
    sc = top.scene()
    grid = build_voxel_grid(top, domain=8)
    o = rng.uniform(-1, 11, (300, 3))
    d = rand_dirs(rng, 300)
    rays = Ray.make(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    ref = jax.tree.map(np.asarray, shoot_grid(sc, rays, grid))
    for kw in (dict(tier=2, cap_s=32), dict(cap=2, tier=1, cap_s=8)):
        hg = jax.tree.map(np.asarray, shoot_grid(sc, rays, grid, **kw))
        np.testing.assert_array_equal(ref.hit, hg.hit)
        h = ref.hit
        np.testing.assert_allclose(ref.t[h], hg.t[h], rtol=1e-6)
        np.testing.assert_array_equal(ref.tri_id[h], hg.tri_id[h])


def test_grid_soft_threshold_agreement(rng):
    """soft early-test pauses must stay exact: every soft value agrees with
    brute force (unresolved rays resume through the straggler rounds)."""
    top = Topology.build(shapes.random_soup(300, seed=11))
    sc = top.scene()
    grid = build_voxel_grid(top, domain=None, avg_polys=8.0)
    o = rng.uniform(-1, 11, (300, 3))
    d = rand_dirs(rng, 300)
    rays = Ray.make(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    hb = jax.tree.map(np.asarray, shoot_brute(sc, rays))
    for soft in (1, 2, 3):
        hg = jax.tree.map(
            np.asarray, shoot_grid(sc, rays, grid, soft=soft)
        )
        np.testing.assert_array_equal(hb.hit, hg.hit, err_msg=f"soft={soft}")
        h = hb.hit
        np.testing.assert_allclose(
            hb.t[h], hg.t[h], rtol=1e-5, atol=1e-6, err_msg=f"soft={soft}"
        )
