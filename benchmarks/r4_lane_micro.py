"""Is an (N, K) op with K << 128 really ~K/128 lane-efficient, and are K
separate (N,) ops cheaper?  Decides the hot-loop data layout for the grid
collect runs buffer and the tree stacks (r4).

Run: python benchmarks/r4_lane_micro.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(np.asarray(x).sum())


def timeit(fn, iters=50):
    r = fn()
    sync(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    sync(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / iters


def main():
    N = 1 << 15
    STEPS = 64
    key = jax.random.PRNGKey(0)

    for K in (8, 24, 64):
        a2 = jax.random.normal(key, (N, K), jnp.float32)
        cnt = jax.random.randint(key, (N,), 0, K, jnp.int32)
        lanes = jnp.arange(K, dtype=jnp.int32)[None, :]

        # ---- (N, K) masked-select loop (the current hot-loop shape)
        def f2d(a, cnt):
            def body(i, s):
                a, c = s
                sel = lanes == c[:, None]
                a = jnp.where(sel, a + 1.0, a)
                c = (c + 1) % K
                return (a, c)

            return jax.lax.fori_loop(0, STEPS, body, (a, cnt))[0]

        j2 = jax.jit(f2d)
        dt2 = timeit(lambda: j2(a2, cnt))

        # ---- K separate (N,) arrays, same logical work
        aT = tuple(a2[:, k] for k in range(K))

        def fsoa(aT, cnt):
            def body(i, s):
                aT, c = s
                aT = tuple(
                    jnp.where(c == k, aT[k] + 1.0, aT[k]) for k in range(K)
                )
                c = (c + 1) % K
                return (aT, c)

            return jax.lax.fori_loop(0, STEPS, body, (aT, cnt))[0][0]

        js = jax.jit(fsoa)
        dts = timeit(lambda: js(aT, cnt))
        print(
            f"K={K:3d}: (N,K) select loop {dt2*1e3:7.3f} ms | "
            f"K x (N,) tuple {dts*1e3:7.3f} ms | ratio {dt2/dts:.2f}x"
        )


if __name__ == "__main__":
    main()
