"""Pallas feasibility probes for the fused grid-march kernel (r4).

Q1: how much VMEM can one kernel actually hold (table residency limit)?
Q2: does Mosaic lower a dynamic row gather from a VMEM table, and at what
    throughput (rows/s) for traversal-shaped workloads?
Q3: what does a while-loop step cost inside a kernel vs the XLA while_loop
    (the ~26 ns/ray-step phase-1 body)?
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.sum(x))


def probe_vmem(mb):
    rows = int(mb * 1e6) // (192 * 4)
    x = jnp.ones((rows, 192), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.sum(x_ref[:], axis=0, keepdims=True)

    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 192), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        sync(f(x))
        return True
    except Exception as e:
        return f"{type(e).__name__}: {str(e)[:200]}"


def probe_gather(n_rows=23793, R=1024, iters=50):
    """Row gather from a VMEM-resident (n_rows, 192) table, R rows/step."""
    table = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_rows, 192)).astype(np.float32)
    )
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, n_rows, size=(R,)).astype(np.int32)
    )

    def kernel(tab_ref, idx_ref, o_ref):
        def body(i, acc):
            g = jnp.take(tab_ref[:], idx_ref[:] + i, axis=0, mode="wrap")
            return acc + jnp.sum(g, axis=1)

        o_ref[:] = jax.lax.fori_loop(0, iters, body, jnp.zeros((R,), jnp.float32))

    f = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    sync(f(table, idx))  # compile
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = f(table, idx)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    ns_per_row = dt / (iters * R) * 1e9
    return dt * 1e3, ns_per_row


def probe_meta_gather(n_cells=110592, R=32768, iters=50):
    """(R,) gather of 2-i32 rows from cell_meta-shaped VMEM table."""
    table = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**20, size=(n_cells, 2)).astype(np.int32)
    )
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, n_cells, size=(R,)).astype(np.int32)
    )

    def kernel(tab_ref, idx_ref, o_ref):
        def body(i, acc):
            g = jnp.take(tab_ref[:], idx_ref[:] + i, axis=0, mode="wrap")
            return acc + g[:, 0] + g[:, 1]

        o_ref[:] = jax.lax.fori_loop(0, iters, body, jnp.zeros((R,), jnp.int32))

    f = jax.jit(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R,), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    sync(f(table, idx))
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = f(table, idx)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    return dt * 1e3, dt / (iters * R) * 1e9


if __name__ == "__main__":
    print("devices:", jax.devices())
    for mb in (8, 16, 32, 64, 96, 120):
        print(f"VMEM probe {mb} MB:", probe_vmem(mb), flush=True)
    try:
        ms, ns = probe_gather()
        print(f"win-row gather (1024 rows/step, 23793x192 table): {ms:.3f} ms/call, {ns:.2f} ns/row", flush=True)
    except Exception as e:
        print("win-row gather FAILED:", type(e).__name__, str(e)[:300], flush=True)
    try:
        ms, ns = probe_meta_gather()
        print(f"cell_meta gather (32768 lanes, 110592x2 table): {ms:.3f} ms/call, {ns:.2f} ns/lane", flush=True)
    except Exception as e:
        print("meta gather FAILED:", type(e).__name__, str(e)[:300], flush=True)
