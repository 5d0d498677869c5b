"""SpatialPartition facade: every accel backend agrees through one API."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hare_tpu.geom import Ray
from hare_tpu.accel import SpatialPartition
from hare_tpu.mesh import Topology, shapes
from hare_tpu.trace import trace_rays


@pytest.mark.quick
@pytest.mark.parametrize(
    "accel", ["brute", "grid", "octree", "kdtree", "kdtree_ropes"]
)
def test_partition_backends_agree(rng, accel):
    top = Topology.build(shapes.concert_hall())
    ref = SpatialPartition(top, accel="brute")
    sp = SpatialPartition(top, accel=accel)
    assert sp.char_step > 0
    o = rng.uniform((2, 2, 1), (28, 48, 16), (64, 3)).astype(np.float32)
    d = rng.normal(0, 1, (64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Ray.make(o, d)
    ha = jax.tree.map(np.asarray, ref.shoot(rays))
    hb = jax.tree.map(np.asarray, sp.shoot(rays))
    np.testing.assert_array_equal(ha.hit, hb.hit)
    np.testing.assert_allclose(ha.t[ha.hit], hb.t[hb.hit], rtol=1e-5, atol=1e-6)


def test_partition_trace_integration(rng):
    top = Topology.build(shapes.shoebox(4, 5, 3))
    sp = SpatialPartition(top, accel="grid", domain=4)
    a = jnp.full(top.n_polys, 0.25, jnp.float32)
    o = np.tile(np.array([2.0, 2.5, 1.5], np.float32), (32, 1))
    d = rng.normal(0, 1, (32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    res = trace_rays(sp.scene, Ray.make(o, d), a, 3, sp.shoot_fn)
    assert np.asarray(res.hit).all()
    np.testing.assert_allclose(np.asarray(res.energy[-1]), 0.75**3, rtol=1e-5)


def test_shoot_fn_memoized():
    """shoot_fn must return the SAME callable on repeated access — a fresh
    closure per access is a static-arg jit footgun that recompiles every
    call (r4: the eval-config harness measured compile time this way)."""
    top = Topology.build(shapes.shoebox(4, 5, 3))
    for accel in ("brute", "grid"):
        sp = SpatialPartition(top, accel=accel, **({"domain": 4} if accel == "grid" else {}))
        assert sp.shoot_fn is sp.shoot_fn
