"""Re-probe Mosaic gather/scatter support on the current toolchain.

Standing PERF_NOTES commitment (VERDICT r2 item 6): round-1 probing
found no usable large-window dynamic_gather (axis-0 only, S=8) and no
scatter.  This re-tests, inside real compiled kernels on the chip:

  1. vectorised row gather from a VMEM table (jnp.take / indexed read),
  2. vectorised scatter-add into a VMEM accumulator (.at[].add),
  3. per-row dynamic_slice loop (the always-available fallback).

Each case reports compiled-or-rejected plus a rough rate when it runs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_pallas_probe.py
"""

import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def probe(name, build, results):
    try:
        fn, args = build()
        out = jax.jit(fn)(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(4):
            sync(jax.jit(fn)(*args))
        dt = (time.perf_counter() - t0) / 4
        results[name] = {"ok": True, "ms": round(dt * 1e3, 2)}
        print(f"{name}: OK {dt*1e3:.2f} ms", flush=True)
    except Exception as e:
        results[name] = {"ok": False, "error": repr(e)[:300]}
        print(f"{name}: REJECTED {e!r}"[:400], flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    results = {}
    N, G, F = 131072, 4096, 128

    table = jax.random.normal(jax.random.PRNGKey(0), (G, F), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, G, jnp.int32)

    # 1. vectorised row gather from VMEM via jnp.take
    def build_take():
        def kernel(idx_ref, tab_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

        bm = 1024
        fn = pl.pallas_call(
            kernel, grid=(N // bm,),
            in_specs=[pl.BlockSpec((bm,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((G, F), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32))
        return lambda i, t: fn(i, t), (idx, table)

    probe("vmem row gather (jnp.take axis=0)", build_take, results)

    # 2. scatter-add into a VMEM accumulator
    def build_scatter():
        vals = jax.random.normal(jax.random.PRNGKey(2), (N, F))

        def kernel(idx_ref, val_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            out_ref[:] = out_ref[:].at[idx_ref[:]].add(val_ref[:])

        bm = 1024
        fn = pl.pallas_call(
            kernel, grid=(N // bm,),
            in_specs=[pl.BlockSpec((bm,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((bm, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, F), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, F), jnp.float32))
        return lambda i, v: fn(i, v), (idx, vals)

    probe("vmem scatter-add (.at[].add)", build_scatter, results)

    # 3. per-row dynamic-slice loop (fallback; expect slow)
    def build_dynslice():
        def kernel(idx_ref, tab_ref, out_ref):
            def body(j, _):
                out_ref[j, :] = tab_ref[idx_ref[j], :]
                return 0

            jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)

        bm = 512
        fn = pl.pallas_call(
            kernel, grid=(4,),   # probe a slice only: 2048 rows
            in_specs=[pl.BlockSpec((bm,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((G, F), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4 * bm, F), jnp.float32))
        return lambda i, t: fn(i[:4 * 512], t), (idx, table)

    probe("per-row dynamic-slice loop (2k rows)", build_dynslice, results)

    payload = json.dumps(results, indent=1)
    print(payload, flush=True)
    with open("pallas_probe_r3.json", "w") as f:
        f.write(payload)


if __name__ == "__main__":
    main()
