"""Aux subsystems: config, metrics, checkpoint roundtrip, determinism."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hare_tpu.utils import (
    HareConfig,
    MetricsLogger,
    determinism_check,
    latest_step,
    restore_state,
    save_state,
    timed,
    trace_metrics,
)


def test_config_roundtrip_and_cli():
    c = HareConfig()
    c2 = HareConfig.from_json(c.to_json())
    assert c == c2
    c3 = HareConfig.from_cli(
        ["--accel", "kdtree", "--n-rays", "1024", "--avg-polys", "4.0"]
    )
    assert c3.accel == "kdtree" and c3.n_rays == 1024 and c3.avg_polys == 4.0
    # accel_params carries BOTH build params and the shoot-time knobs
    # (cap/march) so a config round-trips into a traversal configuration.
    assert c3.accel_params() == {
        # max_depth None = right-size to the scene (r5)
        "max_depth": None, "max_tris_per_node": 16, "march": 32,
    }
    assert HareConfig(accel="grid", domain=16).accel_params() == {
        "domain": 16, "cap": 16,
    }


def test_metrics_logger(tmp_path):
    p = tmp_path / "m.jsonl"
    log = MetricsLogger(str(p))
    log.write(step=0, rays_per_s=1.5e6, note="hello")
    log.grad_norms({"absorption": jnp.ones(4)}, step=1)
    log.close()
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert lines[0]["step"] == 0 and lines[0]["rays_per_s"] == 1.5e6
    assert abs(lines[1]["grad_norms"]["absorption"] - 2.0) < 1e-6


def test_trace_metrics():
    from hare_tpu.mesh import Topology, shapes
    from hare_tpu.accel import shoot_brute
    from hare_tpu.trace import trace_rays, uniform_sphere
    from hare_tpu.geom import Ray

    top = Topology.build(shapes.shoebox())
    sc = top.scene()
    d = uniform_sphere(jax.random.PRNGKey(0), 64)
    o = jnp.tile(jnp.array([2.0, 2.5, 1.5], jnp.float32), (64, 1))
    res = trace_rays(sc, Ray.make(o, d), jnp.full(top.n_polys, 0.3), 3, shoot_brute)
    m = trace_metrics(res)
    assert m["n_rays"] == 64 and m["n_bounces"] == 3
    assert all(0.99 <= occ <= 1.0 for occ in m["bounce_occupancy"])
    assert m["total_energy"] == pytest.approx(sum(m["bounce_energy"]), rel=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path / "ckpt")
    state = {
        "params": {"absorption": jnp.linspace(0, 1, 7)},
        "rng": jax.random.PRNGKey(3),
        "cursor": jnp.asarray(42),
    }
    assert latest_step(d) is None
    save_state(d, 5, state)
    save_state(d, 9, jax.tree.map(lambda x: x + 1 if x.dtype != jnp.uint32 else x, state))
    assert latest_step(d) == 9
    out5 = restore_state(d, state, step=5)
    np.testing.assert_allclose(out5["params"]["absorption"], state["params"]["absorption"])
    out9 = restore_state(d, state)
    assert int(out9["cursor"]) == 43


def test_determinism_check():
    from hare_tpu.mesh import Topology, shapes
    from hare_tpu.accel import build_voxel_grid, shoot_grid
    from hare_tpu.geom import Ray

    top = Topology.build(shapes.shoebox())
    sc = top.scene()
    g = build_voxel_grid(top, domain=4)
    rng = np.random.default_rng(0)
    o = rng.uniform((1, 1, 1), (3, 4, 2), (64, 3)).astype(np.float32)
    dd = rng.normal(size=(64, 3)).astype(np.float32)
    rays = Ray.make(o, dd)
    assert determinism_check(lambda: shoot_grid(sc, rays, g))

    def flaky():
        return np.random.default_rng().normal(size=3)

    with pytest.raises(AssertionError):
        determinism_check(flaky)


def test_timed_runs():
    f = jax.jit(lambda x: x * 2.0)
    dt, out = timed(f, jnp.ones(128), iters=3)
    assert dt >= 0 and float(out[0]) == 2.0


def test_fault_injection_resume(tmp_path):
    """SURVEY.md §5 failure detection: kill an optimization sweep mid-flight,
    restart from the latest checkpoint, and verify the resumed run reaches a
    bitwise-identical final state to an uninterrupted run (fail-fast +
    restart-from-checkpoint is the whole recovery contract)."""
    import jax
    import jax.numpy as jnp
    import optax

    from hare_tpu.geom import Ray
    from hare_tpu.accel import SpatialPartition
    from hare_tpu.mesh import Topology, shapes
    from hare_tpu.trace import energy_histogram, trace_rays, uniform_sphere
    from hare_tpu.utils import latest_step, restore_state, save_state

    top = Topology.build(shapes.shoebox(4, 5, 3))
    sp = SpatialPartition(top, accel="grid", domain=4)
    d = uniform_sphere(jax.random.PRNGKey(0), 64)
    o = jnp.tile(jnp.array([2.0, 2.5, 1.5], jnp.float32), (64, 1))
    rays = Ray.make(o, d)
    a_true = jnp.full(top.n_polys, 0.4, jnp.float32)

    def hist(a):
        res = trace_rays(sp.scene, rays, a, 3, sp.shoot_fn, aux=sp.aux)
        return energy_histogram(res, 64, 1e-3)

    target = hist(a_true)
    opt = optax.adam(0.1)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            return jnp.sum((hist(jax.nn.sigmoid(p["a"])) - target) ** 2)

        l, g = jax.value_and_grad(loss)(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return jax.tree.map(lambda x, u: x + u, params, upd), opt_state, l

    ckdir = str(tmp_path / "ck")

    def sweep(n_steps, fail_at=None):
        params = {"a": jnp.zeros(top.n_polys, jnp.float32)}
        opt_state = opt.init(params)
        start = 0
        if latest_step(ckdir) is not None:
            st = restore_state(ckdir, {"params": params,
                                       "opt_state": opt_state,
                                       "cursor": jnp.asarray(0)})
            params, opt_state = st["params"], st["opt_state"]
            start = int(st["cursor"])
        for i in range(start, n_steps):
            if fail_at is not None and i == fail_at:
                raise RuntimeError("injected host failure")
            params, opt_state, _ = step(params, opt_state)
            save_state(ckdir, i, {"params": params, "opt_state": opt_state,
                                  "cursor": jnp.asarray(i + 1)})
        return params

    # Uninterrupted reference.
    ref = sweep(6)
    import shutil

    shutil.rmtree(ckdir)
    # Interrupted at step 3, then resumed.
    try:
        sweep(6, fail_at=3)
        assert False, "fault was not injected"
    except RuntimeError:
        pass
    resumed = sweep(6)
    np.testing.assert_array_equal(np.asarray(ref["a"]), np.asarray(resumed["a"]))
