"""Round-2 TPU lab probes (run on the real chip, one process).

Measures, with the honest harness (varied inputs + forced D2H sync per
call — block_until_ready can return early through the remote tunnel):

  1. dense TPM trilerp throughput per level size G (fwd and fwd+bwd)
     vs the measured gather floor (~200M lookups/s),
  2. scatter-add cost: (N, F) row updates vs N*F scalar updates,
  3. Mosaic gather/scatter capability re-probe at this toolchain,
  4. full train-step rates for the bench modes (delegates to bench.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_r2.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, inputs, iters=5):
    """fn(input) timed with per-call sync; inputs vary per call."""
    fn(inputs[0])  # compile
    sync(fn(inputs[0]))
    t0 = time.perf_counter()
    for i in range(iters):
        sync(fn(inputs[i % len(inputs)]))
    return (time.perf_counter() - t0) / iters


def probe_dense_tpm():
    from human_body_reconstruction_tpu.ops import dense_grid as dg
    from human_body_reconstruction_tpu.utils.config import HashConfig

    print("== dense TPM trilerp (N=2,097,152 points) ==")
    N = 2 ** 21
    keys = [jax.random.PRNGKey(i) for i in range(3)]
    xs = [jax.random.uniform(k, (N, 3)) for k in keys]
    for (nmin, levels) in [(16, 1), (16, 2), (16, 4)]:
        cfg = HashConfig(num_levels=16, n_min=nmin, n_max=2048,
                         dense_levels=levels)
        grids = dg.init_dense(jax.random.PRNGKey(0), cfg)
        gs = [g.shape[0] for g in grids]

        @jax.jit
        def fwd(x):
            return dg.dense_encode(grids, x, 0.0, 1.0, cfg)

        @jax.jit
        def fwdbwd(x):
            def loss(g):
                return jnp.sum(dg.dense_encode(g, x, 0.0, 1.0, cfg) ** 2)
            return jax.grad(loss)(grids)[0]

        tf = timeit(fwd, xs)
        tb = timeit(fwdbwd, xs)
        # equivalent gather cost: levels lookups per point at 200M/s
        equiv = levels * N / 200e6
        print(f"  G={gs}: fwd {tf*1e3:.1f} ms, fwd+bwd {tb*1e3:.1f} ms, "
              f"gather-equiv fwd {equiv*1e3:.1f} ms "
              f"({N*levels/tf/1e6:.0f}M pt-lvl/s fwd)")


def probe_scatter_rows():
    print("== scatter-add: rows vs scalars (16M contributions) ==")
    T, F = 2 ** 16 * 16, 4
    N = 2 ** 22  # 4M rows of F=4 -> 16M scalar contributions
    keys = [jax.random.PRNGKey(i) for i in range(3)]
    idxs = [jax.random.randint(k, (N,), 0, T) for k in keys]
    upd_rows = jax.random.normal(jax.random.PRNGKey(9), (N, F))
    upd_flat = upd_rows.reshape(-1)

    @jax.jit
    def row_scatter(idx):
        return jnp.zeros((T, F), jnp.float32).at[idx].add(upd_rows)

    @jax.jit
    def scalar_scatter(idx):
        flat = (idx[:, None] * F + jnp.arange(F)[None, :]).reshape(-1)
        return jnp.zeros((T * F,), jnp.float32).at[flat].add(upd_flat)

    tr = timeit(row_scatter, idxs)
    ts = timeit(scalar_scatter, idxs)
    print(f"  row (1,{F}) windows: {tr*1e3:.1f} ms "
          f"({N/tr/1e6:.0f}M rows/s)")
    print(f"  scalar:              {ts*1e3:.1f} ms "
          f"({N*F/ts/1e6:.0f}M scalars/s)")


def probe_mosaic():
    print("== Mosaic gather/scatter re-probe ==")
    from jax.experimental import pallas as pl

    try:
        import jax.experimental.pallas.tpu as pltpu
    except ImportError:
        from jax.experimental.pallas import tpu as pltpu

    # (a) take_along_axis along lanes inside a kernel
    def k_lane(table_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(table_ref[...], idx_ref[...], axis=1)

    # (b) sublane gather at window sizes 8/32/128
    def try_kernel(name, kernel, args, out_shape):
        try:
            out = pl.pallas_call(kernel, out_shape=out_shape)(*args)
            out.block_until_ready()
            print(f"  {name}: OK")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:110]
            print(f"  {name}: FAIL ({msg})")

    table = jax.random.normal(jax.random.PRNGKey(0), (8, 128))
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 128)
    try_kernel("lane take_along_axis (8,128)", k_lane, (table, idx),
               jax.ShapeDtypeStruct((8, 128), jnp.float32))

    for S in (8, 32, 256):
        tbl = jax.random.normal(jax.random.PRNGKey(2), (S, 128))
        ix = jax.random.randint(jax.random.PRNGKey(3), (8, 128), 0, S)

        def k_sub(table_ref, idx_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(
                table_ref[...], idx_ref[...] % table_ref.shape[0], axis=0)

        try_kernel(f"sublane gather window={S}", k_sub, (tbl, ix),
                   jax.ShapeDtypeStruct((8, 128), jnp.float32))

    def k_scatter(idx_ref, upd_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] = o_ref[...].at[idx_ref[...], jnp.arange(128)[None, :]
                                   ].add(upd_ref[...])

    ix = jax.random.randint(jax.random.PRNGKey(4), (8, 128), 0, 8)
    upd = jax.random.normal(jax.random.PRNGKey(5), (8, 128))
    try_kernel("in-kernel scatter-add", k_scatter, (ix, upd),
               jax.ShapeDtypeStruct((8, 128), jnp.float32))


def main():
    print(f"devices: {jax.devices()}")
    probe_mosaic()
    probe_scatter_rows()
    probe_dense_tpm()


if __name__ == "__main__":
    main()
