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
