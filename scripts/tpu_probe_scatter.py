"""Measure scatter-add strategies for the hash-encoder backward on TPU.

The backward's dominant cost is a random scatter-add of L*N fp32
contributions into the (L*T*F,) gradient buffer (~77M contribs/s
measured, scripts/tpu_probe_r2.py), while gathers reach ~200M/s.
Candidate fixes probed here, at the headline-shape volumes:

  a. baseline random .at[].add
  b. pre-sorted indices + indices_are_sorted=True scatter
  c. sort cost alone (lax.sort of (idx, val) pairs)
  d. sort + run-boundary segment-sum + unique sorted scatter
  e. one_hot matmul partial-sum into a (buckets, T') tile (MXU route)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_scatter.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, inputs, n=6, sync=lambda o: float(jnp.sum(o))):
    """inputs: list of arg-tuples, rotated per call (CLAUDE.md timing
    rule: identical inputs through the tunnel can short-circuit)."""
    fn(*inputs[0])  # compile
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(n):
        acc += sync(fn(*inputs[i % len(inputs)]))
    dt = (time.perf_counter() - t0) / n
    return dt, acc


def main():
    print("devices:", jax.devices())
    L, T, F = 6, 65536, 4
    SIZE = L * T * F
    for N in (1_048_576, 3_145_728, 6_291_456):
        idxs = [jax.random.randint(jax.random.PRNGKey(7 * i), (N,), 0,
                                   SIZE, dtype=jnp.int32)
                for i in range(3)]
        vals = [jax.random.normal(jax.random.PRNGKey(7 * i + 1), (N,),
                                  jnp.float32) for i in range(3)]
        idx, val = idxs[0], vals[0]
        pairs = list(zip(idxs, vals))
        sorted_pairs = [(jnp.sort(i), v) for i, v in pairs]

        @jax.jit
        def scat_random(i, v):
            return jnp.zeros((SIZE,), jnp.float32).at[i].add(v)

        @jax.jit
        def scat_sorted(i, v):
            return jnp.zeros((SIZE,), jnp.float32).at[i].add(
                v, indices_are_sorted=True)

        @jax.jit
        def sort_pairs(i, v):
            si, sv = jax.lax.sort((i, v), num_keys=1)
            return si.astype(jnp.float32) + sv

        @jax.jit
        def sort_segsum_scatter(i, v):
            # sort, collapse duplicate indices via compact run ids, then
            # ONE sorted scatter of unique (idx, total) pairs.  Unused
            # run slots keep idx = SIZE-1 (they sit at the tail, so the
            # final index list stays sorted) and total = 0.
            si, sv = jax.lax.sort((i, v), num_keys=1)
            is_start = jnp.concatenate(
                [jnp.ones((1,), bool), si[1:] != si[:-1]])
            run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # sorted
            totals = jnp.zeros((N,), jnp.float32).at[run_id].add(
                sv, indices_are_sorted=True)
            out_idx = jnp.full((N,), SIZE - 1, jnp.int32).at[run_id].min(
                si, indices_are_sorted=True)
            return jnp.zeros((SIZE,), jnp.float32).at[out_idx].add(
                totals, indices_are_sorted=True)

        t_rand, _ = timed(scat_random, pairs)
        t_sortd, _ = timed(scat_sorted, sorted_pairs)
        t_sort, _ = timed(sort_pairs, pairs)
        t_full, _ = timed(sort_segsum_scatter, pairs)
        print(f"N={N:>9}: random {t_rand*1e3:7.1f} ms ({N/t_rand/1e6:6.1f}M/s)"
              f" | sorted-scatter {t_sortd*1e3:7.1f} ms ({N/t_sortd/1e6:6.1f}M/s)"
              f" | sort {t_sort*1e3:7.1f} ms"
              f" | sort+segsum+scatter {t_full*1e3:7.1f} ms")

        # numerical check of the segsum path (CPU small case done in
        # tests; here just cross-check against random scatter)
        a = np.asarray(scat_random(idx, val))
        b = np.asarray(sort_segsum_scatter(idx, val))
        print("   segsum max abs err:", np.abs(a - b).max())


if __name__ == "__main__":
    main()
