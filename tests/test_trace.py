"""Bounce-loop tests: oracle parity (config 1), energy conservation, grads."""

import numpy as np
import jax
import jax.numpy as jnp

from hare_tpu.geom import Ray
from hare_tpu.accel import shoot_brute
from hare_tpu.mesh import Topology, shapes
from hare_tpu.oracle import oracle_trace
from hare_tpu.trace import energy_histogram, reflect, trace_rays, uniform_sphere


def make_room():
    top = Topology.build(shapes.shoebox(4, 5, 3))
    rng = np.random.default_rng(42)
    absorption = rng.uniform(0.1, 0.5, top.n_polys)
    return top, absorption


def test_reflect():
    d = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = np.asarray(reflect(d, n))
    np.testing.assert_allclose(r, [[1.0, 1.0, 0.0]], atol=1e-7)
    # sign-invariance in the normal
    r2 = np.asarray(reflect(d, -n))
    np.testing.assert_allclose(r, r2, atol=1e-7)


def test_trace_matches_oracle(rng):
    """Config-1 slice: multi-bounce specular path == float64 oracle."""
    top, absorption = make_room()
    sc = top.scene()
    n_rays, n_bounces = 40, 4
    o = rng.uniform((0.5, 0.5, 0.5), (3.5, 4.5, 2.5), (n_rays, 3))
    d = rng.normal(0, 1, (n_rays, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    res = trace_rays(
        sc,
        Ray.make(o.astype(np.float32), d.astype(np.float32)),
        jnp.asarray(absorption, jnp.float32),
        n_bounces,
        shoot_brute,
    )
    res = jax.tree.map(np.asarray, res)

    for i in range(n_rays):
        ref = oracle_trace(top, o[i], d[i], absorption, n_bounces)
        assert len(ref) == int(res.hit[:, i].sum()), f"ray {i} bounce count"
        for b, rb in enumerate(ref):
            assert int(res.poly_id[b, i]) == rb["poly_id"], (i, b)
            np.testing.assert_allclose(res.point[b, i], rb["point"], atol=2e-3)
            np.testing.assert_allclose(res.energy[b, i], rb["energy"], rtol=1e-4)
            np.testing.assert_allclose(res.time[b, i], rb["time"], rtol=1e-4)


def test_energy_monotone_and_conserved(rng):
    top, _ = make_room()
    sc = top.scene()
    absorption = jnp.full(top.n_polys, 0.3, jnp.float32)
    key = jax.random.PRNGKey(0)
    d = uniform_sphere(key, 128)
    o = jnp.tile(jnp.array([2.0, 2.5, 1.5], jnp.float32), (128, 1))
    res = trace_rays(sc, Ray.make(o, d), absorption, 6, shoot_brute)
    e = np.asarray(res.energy)
    hit = np.asarray(res.hit)
    assert hit.all()  # closed room, nothing escapes
    # uniform absorption: energy after bounce b is exactly 0.7^(b+1)
    for b in range(6):
        np.testing.assert_allclose(e[b], 0.7 ** (b + 1), rtol=1e-5)
    # histogram conserves total energy
    hist = np.asarray(energy_histogram(res, n_bins=512, bin_dt=1e-3))
    np.testing.assert_allclose(hist.sum(), e.sum(), rtol=1e-4)


def test_histogram_binning():
    top, _ = make_room()
    sc = top.scene()
    absorption = jnp.zeros(top.n_polys, jnp.float32)
    # One ray straight up from floor center: hits ceiling at dist 1.5,
    # then floor at +3, then ceiling... times = 1.5/343, 4.5/343, ...
    o = jnp.array([[2.0, 2.5, 1.5]], jnp.float32)
    d = jnp.array([[0.0, 0.0, 1.0]], jnp.float32)
    res = trace_rays(sc, Ray.make(o, d), absorption, 3, shoot_brute)
    hist = np.asarray(energy_histogram(res, n_bins=100, bin_dt=1e-3))
    times = np.asarray(res.time)[:, 0]
    np.testing.assert_allclose(times * 343.0, [1.5, 4.5, 7.5], rtol=1e-5)
    expected_bins = (times / 1e-3).astype(int)
    for b in expected_bins:
        assert hist[b] >= 1.0 - 1e-5


def test_polygon_points_quad_parity():
    """Quadrilateral.GetRandomPoint parity: samples lie on the quad's plane
    inside its bounds, split ~area-fraction between the two triangles."""
    from hare_tpu.trace import polygon_points

    top = Topology.build(shapes.shoebox_quads(4, 5, 3))
    # floor quad: z = 0, spans [0,4]x[0,5]
    pid = 0
    pts = np.asarray(polygon_points(jax.random.PRNGKey(2), top, pid, 4000))
    corners = top.vertices[top.poly_verts[pid]]
    assert abs(corners[:, 2]).max() < 1e-12  # it really is the floor
    assert np.abs(pts[:, 2]).max() < 1e-5
    assert (pts[:, 0] >= -1e-5).all() and (pts[:, 0] <= 4 + 1e-5).all()
    assert (pts[:, 1] >= -1e-5).all() and (pts[:, 1] <= 5 + 1e-5).all()
    # Uniformity: each quadrant of the rectangle gets ~25%.
    qx, qy = pts[:, 0] > 2.0, pts[:, 1] > 2.5
    for m in (qx & qy, qx & ~qy, ~qx & qy, ~qx & ~qy):
        assert 0.2 < m.mean() < 0.3
    # Triangle polygon path too.
    top3 = Topology.build(shapes.shoebox(4, 5, 3))
    pts3 = np.asarray(polygon_points(jax.random.PRNGKey(3), top3, 0, 500))
    assert np.isfinite(pts3).all() and pts3.shape == (500, 3)


def test_soft_histogram_conserves_and_differentiates():
    """Tent-binned histogram: totals equal the hard histogram's (energy
    conservation incl. the clamped boundary halves), values split between
    the bracketing bin centers, and — the point of the feature — the
    histogram is differentiable in arrival TIME (the hard form's
    floor-cast gradient is zero a.e., which is why fit_vertices needs
    soft binning)."""
    from hare_tpu.trace import TraceResult

    hit = jnp.array([[True, True, True, False]])
    energy = jnp.array([[0.5, 0.25, 1.0, 7.0]])
    #              bin0/1 split   bin12/13    clamped into last bin   dead
    time = jnp.array([[0.0011, 0.0129, 99.0, 1.0]])
    z = jnp.zeros((1, 4))
    res = TraceResult(hit, energy, time, z.astype(jnp.int32), jnp.zeros((1, 4, 3)), z)

    hh = np.asarray(energy_histogram(res, 16, 1e-3))
    hs = np.asarray(energy_histogram(res, 16, 1e-3, soft=True))
    np.testing.assert_allclose(hh.sum(), 1.75, rtol=1e-6)
    np.testing.assert_allclose(hs.sum(), 1.75, rtol=1e-6)
    # t=1.1ms, centers at 0.5/1.5ms -> frac 0.6: bin0 gets 0.2, bin1 0.3.
    np.testing.assert_allclose(hs[0], 0.2, rtol=1e-5)
    np.testing.assert_allclose(hs[1], 0.3, rtol=1e-5)
    np.testing.assert_allclose(hs[15], 1.0, rtol=1e-6)  # clamped overflow

    def first_moment(tt, soft):
        h = energy_histogram(res._replace(time=tt), 16, 1e-3, soft=soft)
        return jnp.sum(h * jnp.arange(16, dtype=h.dtype))

    g_soft = np.asarray(jax.grad(lambda tt: first_moment(tt, True))(time))
    g_hard = np.asarray(jax.grad(lambda tt: first_moment(tt, False))(time))
    assert np.any(g_soft != 0.0)
    np.testing.assert_array_equal(g_hard, 0.0)
    # d(moment)/dt for the split ray = energy / bin_dt = 500.
    np.testing.assert_allclose(g_soft[0, 0], 0.5 / 1e-3, rtol=1e-4)


def test_grad_absorption(rng):
    """d(histogram energy)/d(absorption): negative, matches finite diff."""
    top, absorption = make_room()
    sc = top.scene()
    o = rng.uniform((1.0, 1.0, 1.0), (3.0, 4.0, 2.0), (64, 3)).astype(np.float32)
    dirs = rng.normal(0, 1, (64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays = Ray.make(o, dirs)

    def loss(a):
        res = trace_rays(sc, rays, a, 3, shoot_brute)
        return jnp.sum(energy_histogram(res, n_bins=256, bin_dt=1e-3))

    a0 = jnp.asarray(absorption, jnp.float32)
    g = np.asarray(jax.grad(loss)(a0))
    assert (g <= 1e-8).all()  # more absorption can only reduce energy
    assert (g < -1e-6).any()
    # finite-difference spot check on the 3 largest-magnitude entries
    f0 = float(loss(a0))
    for k in np.argsort(g)[:3]:
        eps = 1e-3
        fp = float(loss(a0.at[k].add(eps)))
        fd = (fp - f0) / eps
        np.testing.assert_allclose(g[k], fd, rtol=0.05, atol=1e-4)


def test_grad_vertices_smooth(rng):
    """Gradients w.r.t. vertex positions exist and match finite differences
    in the fixed-hit-topology regime (SURVEY.md §7 'hard parts')."""
    top, _ = make_room()
    sc = top.scene()
    absorption = jnp.full(top.n_polys, 0.2, jnp.float32)
    o = jnp.tile(jnp.array([2.0, 2.5, 1.5], jnp.float32), (16, 1))
    d = np.asarray(uniform_sphere(jax.random.PRNGKey(3), 16))
    rays = Ray.make(o, jnp.asarray(d))

    def loss(verts):
        res = trace_rays(sc.with_vertices(verts), rays, absorption, 2, shoot_brute)
        return jnp.sum(res.time * res.energy * res.hit)

    v0 = sc.vertices
    g = np.asarray(jax.grad(loss)(v0))
    assert np.isfinite(g).all() and (np.abs(g) > 0).any()
    f0 = float(loss(v0))
    flat = np.abs(g).ravel()
    for idx in np.argsort(flat)[-3:]:
        i, j = divmod(int(idx), 3)
        eps = 1e-3
        fp = float(loss(v0.at[i, j].add(eps)))
        fd = (fp - f0) / eps
        np.testing.assert_allclose(g[i, j], fd, rtol=0.08, atol=1e-5)


def test_scattering_unbiased_and_deterministic(rng):
    """Fair-coin diffuse/specular split: E[energy] independent of s at the
    first bounce; same key => bitwise-identical trace (SURVEY.md §5 race
    detection analog)."""
    top, _ = make_room()
    sc = top.scene()
    a = jnp.full(top.n_polys, 0.3, jnp.float32)
    o = jnp.tile(jnp.array([2.0, 2.5, 1.5], jnp.float32), (4096, 1))
    d = uniform_sphere(jax.random.PRNGKey(1), 4096)
    rays = Ray.make(o, d)
    key = jax.random.PRNGKey(5)
    for s_val in (0.0, 0.5, 1.0):
        s = jnp.full(top.n_polys, s_val, jnp.float32)
        res = trace_rays(sc, rays, a, 3, shoot_brute, scattering=s, key=key)
        # First-bounce mean energy ~ (1-a) = 0.7 for any s (unbiased split;
        # per-ray std is 0.7 at the extremes -> SE ~ 0.011 at n=4096).
        assert abs(float(res.energy[0].mean()) - 0.7) < 0.05, s_val
    s = jnp.full(top.n_polys, 0.4, jnp.float32)
    r1 = trace_rays(sc, rays, a, 3, shoot_brute, scattering=s, key=key)
    r2 = trace_rays(sc, rays, a, 3, shoot_brute, scattering=s, key=key)
    for x, y in zip(jax.tree.leaves(r1), jax.tree.leaves(r2)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_grad_scattering_fd(rng):
    """d(histogram)/d(scattering) matches finite differences (fixed key)."""
    top, absorption = make_room()
    sc = top.scene()
    a = jnp.asarray(absorption, jnp.float32)
    o = rng.uniform((1.0, 1.0, 1.0), (3.0, 4.0, 2.0), (64, 3)).astype(np.float32)
    dirs = rng.normal(0, 1, (64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays = Ray.make(o, dirs)
    key = jax.random.PRNGKey(11)

    def loss(s):
        res = trace_rays(sc, rays, a, 3, shoot_brute, scattering=s, key=key)
        return jnp.sum(energy_histogram(res, n_bins=256, bin_dt=1e-3))

    s0 = jnp.full(top.n_polys, 0.35, jnp.float32)
    g = np.asarray(jax.grad(loss)(s0))
    assert np.isfinite(g).all() and (np.abs(g) > 1e-6).any()
    f0 = float(loss(s0))
    for k in np.argsort(-np.abs(g))[:3]:
        eps = 1e-3
        fp = float(loss(s0.at[k].add(eps)))
        fd = (fp - f0) / eps
        np.testing.assert_allclose(g[k], fd, rtol=0.05, atol=1e-3)


def test_joint_absorption_scattering_recovery():
    """Inverse design: recover hidden (absorption, scattering) jointly from
    a target histogram by gradient descent (the north star's grads w.r.t.
    'absorption/scattering coefficients')."""
    import optax

    top, _ = make_room()
    sc = top.scene()
    o = jnp.tile(jnp.array([2.0, 2.5, 1.5], jnp.float32), (256, 1))
    d = uniform_sphere(jax.random.PRNGKey(2), 256)
    rays = Ray.make(o, d)
    key = jax.random.PRNGKey(9)

    a_true = jnp.full(top.n_polys, 0.35, jnp.float32)
    s_true = jnp.full(top.n_polys, 0.6, jnp.float32)

    def hist(a, s):
        res = trace_rays(
            sc, rays, a, 4, shoot_brute, scattering=s, key=key
        )
        return energy_histogram(res, n_bins=64, bin_dt=2e-3)

    target = hist(a_true, s_true)

    def loss(params):
        a = jax.nn.sigmoid(params["la"])
        s = jax.nn.sigmoid(params["ls"])
        h = hist(a, s)
        return jnp.mean((h - target) ** 2)

    params = {
        "la": jnp.zeros(top.n_polys, jnp.float32),
        "ls": jnp.zeros(top.n_polys, jnp.float32),
    }
    opt = optax.adam(0.1)
    state = opt.init(params)
    step = jax.jit(
        lambda p, st: (lambda l, g: (l, *opt.update(g, st, p)))(
            *jax.value_and_grad(loss)(p)
        )
    )
    for _ in range(120):
        l, upd, state = step(params, state)
        params = jax.tree.map(lambda x, u: x + u, params, upd)
    a_fit = np.asarray(jax.nn.sigmoid(params["la"]))
    s_fit = np.asarray(jax.nn.sigmoid(params["ls"]))
    # Same fixed key => loss is smooth and the optimum is the true pair.
    assert np.abs(a_fit - 0.35).mean() < 0.05, a_fit
    assert np.abs(s_fit - 0.6).mean() < 0.15, s_fit


def test_remat_matches_plain(rng):
    """jax.checkpoint per bounce: identical values and gradients."""
    top, absorption = make_room()
    sc = top.scene()
    a0 = jnp.asarray(absorption, jnp.float32)
    o = rng.uniform((1.0, 1.0, 1.0), (3.0, 4.0, 2.0), (32, 3)).astype(np.float32)
    dirs = rng.normal(0, 1, (32, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays = Ray.make(o, dirs)

    def loss(a, remat):
        res = trace_rays(sc, rays, a, 8, shoot_brute, remat=remat)
        return jnp.sum(energy_histogram(res, n_bins=256, bin_dt=1e-3))

    v1, g1 = jax.value_and_grad(lambda a: loss(a, False))(a0)
    v2, g2 = jax.value_and_grad(lambda a: loss(a, True))(a0)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)
