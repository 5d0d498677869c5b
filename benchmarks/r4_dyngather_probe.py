"""Throughput of tpu.dynamic_gather (via take_along_axis) inside a Pallas
kernel — the one gather form Mosaic supports.  If fast, BOTH traversal
phases can run VMEM-resident in one kernel:
  - march: cell_meta (n_cells, 2) i32 gathered per DDA step,
  - test: win_data padded to (>=N, 12*win) f32, one gather per buffer slot
    with (N,)-aligned outputs (no reshapes, no scatters).

Run: python benchmarks/r4_dyngather_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def probe(A, B, dtype, loop_iters, label):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(A, B)).astype(np.float32)).astype(dtype)
    idx = jnp.asarray(rng.integers(0, A, size=(A, 1)).astype(np.int32))

    def kernel(tab_ref, idx_ref, o_ref):
        idx2 = jnp.broadcast_to(idx_ref[:], (A, B))

        def body(i, acc):
            g = jnp.take_along_axis(
                tab_ref[:], (idx2 + i) % A, axis=0
            )
            return acc + jnp.sum(g.astype(jnp.float32), axis=1)

        o_ref[:] = jax.lax.fori_loop(
            0, loop_iters, body, jnp.zeros((A,), jnp.float32)
        )

    try:
        f = jax.jit(
            pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((A,), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        )
        dt = timeit(lambda: f(tab, idx))
        rows = A * loop_iters
        elems = rows * B
        print(
            f"{label}: {dt*1e3:.3f} ms for {loop_iters} gathers of "
            f"({A},{B}) -> {dt/rows*1e9:.2f} ns/row, "
            f"{elems/dt/1e9:.1f} Gelem/s"
        )
    except Exception as e:
        print(f"{label} FAILED: {type(e).__name__}: {str(e)[:400]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    # cell_meta-shaped: per-DDA-step march gather
    probe(110592, 2, jnp.int32, 32, "cell_meta (110592,2) i32")
    # win-row-shaped: per-slot test gather (N rows of 384 lanes)
    probe(32768, 384, jnp.float32, 8, "win rows (32768,384) f32")
    # narrow ctx rows
    probe(32768, 8, jnp.float32, 32, "ctx rows (32768,8) f32")
