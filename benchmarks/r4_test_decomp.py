"""Decompose test_windows cost: C-sweep + ablations to find the
width-independent per-call overhead (~2.7 ms at 32k rays) that dominates
every traversal round.

Run: python benchmarks/r4_test_decomp.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from hare_tpu.geom import Ray
from hare_tpu.geom.intersect import kernel_components
from hare_tpu.accel import SpatialPartition
from hare_tpu.accel.common import test_windows
from hare_tpu.mesh import Topology, shapes
from hare_tpu.trace import uniform_sphere


def sync(x):
    return float(np.asarray(x).sum())


def timeit(fn, iters=20):
    r = fn()
    sync(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    sync(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / iters


def main():
    faces = shapes.shoebox(20.0, 20.0, 20.0) + shapes.icosphere(
        6, radius=6.0, center=(10.0, 10.0, 10.0)
    )
    top = Topology.build(faces)
    sp = SpatialPartition(top, accel="grid", domain=48, win=32)
    wd = sp.struct.win_data
    win = wd.shape[1] // 12
    nw = wd.shape[0] - 1
    n = 1 << 15
    key = jax.random.PRNGKey(0)
    d = uniform_sphere(key, n)
    o = jnp.tile(jnp.array([10.0, 10.0, 10.0], jnp.float32), (n, 1)) + 6.5 * d
    ex = jnp.full((n, 2), -9, jnp.int32)
    bt0 = jnp.full((n,), jnp.inf)
    btr0 = jnp.full((n,), -1, jnp.int32)
    act = jnp.ones((n,), bool)
    rng = np.random.default_rng(0)

    # ---- C sweep of the real thing
    for C in (1, 2, 4, 8):
        buf = jnp.asarray(rng.integers(0, nw, (n, C)).astype(np.int32))
        f = jax.jit(
            lambda b: test_windows(wd, b, o, d, ex, act, bt0, btr0, 1e-10, None)[0]
        )
        dt = timeit(lambda: f(buf))
        print(f"test_windows C={C}: {dt*1e3:.3f} ms")

    # ---- ablations at C=4
    C = 4
    buf = jnp.asarray(rng.integers(0, nw, (n, C)).astype(np.int32))
    M = n * C

    def g_only(b):
        g = wd[b.reshape(M)]
        # consume with a cheap full-row reduce (fusible, no slicing)
        return jnp.sum(g, axis=1)

    def g_math_min(b):
        """gather + kernel math + in-row tree-min, but NO per-ray rep():
        fixed dummy o/d per candidate (isolates the rep/broadcast cost)."""
        g = wd[b.reshape(M)]
        cmp = [g[:, win * i : win * (i + 1)] for i in range(9)]
        oc = tuple(jnp.zeros((M, 1)) for _ in range(3))
        dc = (jnp.ones((M, 1)), jnp.full((M, 1), 0.5), jnp.full((M, 1), 0.25))
        valid, t, _, _ = kernel_components("watertight", oc, dc, cmp)
        t = jnp.where(valid, t, jnp.inf)
        while t.shape[1] > 1:
            h = t.shape[1] // 2
            t = jnp.minimum(t[:, :h], t[:, h:])
        return t[:, 0]

    def full_no_min(b):
        """everything except the tree-min (sum instead)."""
        g = wd[b.reshape(M)]
        cmp = [g[:, win * i : win * (i + 1)] for i in range(9)]
        rep = lambda x: jnp.repeat(x, C, axis=0)[:, None]
        dc = (rep(d[:, 0]), rep(d[:, 1]), rep(d[:, 2]))
        oc = (rep(o[:, 0]), rep(o[:, 1]), rep(o[:, 2]))
        valid, t, _, _ = kernel_components("watertight", oc, dc, cmp)
        return jnp.sum(jnp.where(valid, t, 0.0))

    def rep_only(b):
        rep = lambda x: jnp.repeat(x, C, axis=0)[:, None]
        outs = [rep(o[:, c]) + rep(d[:, c]) for c in range(3)]
        return outs[0] + outs[1] + outs[2] + jnp.sum(wd[b.reshape(M)], axis=1)[:, None]

    for name, fn in (
        ("gather+rowsum", g_only),
        ("gather+math+min, no rep", g_math_min),
        ("full minus tree-min", full_no_min),
        ("gather + rep only", rep_only),
    ):
        dt = timeit(lambda fn=fn: jax.jit(fn)(buf))
        print(f"{name} (C=4): {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
