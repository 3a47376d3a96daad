"""Isolate the `--occ_dt mass` step slowdown on TPU.

Flagship runs with dt_mode="mass" train at 14-22k rays/s vs 50-75k for
"clip" at identical shapes (results/r2_flagship_k32m vs _k32), yet the
mass branch only adds a (B, K, M) one-hot broadcast-reduction that
should cost ~1 ms.  Time, at headline shapes (B=16384, K=32, M=64):

  a. occupancy_guided_ts dt_mode="clip"
  b. occupancy_guided_ts dt_mode="mass"
  c. the mass tail alone (floor + one-hot interval mass + IS weights)
  d. sample_pdf alone (shared by both modes)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_guided.py
"""

import time

import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.ops import occupancy as occ_lib
from human_body_reconstruction_tpu.ops import sampling


def timed(fn, inputs, n=5):
    fn(inputs[0])
    t0 = time.perf_counter()
    for i in range(n):
        float(jnp.sum(fn(inputs[i % len(inputs)])))
    return (time.perf_counter() - t0) / n


def main():
    print("devices:", jax.devices())
    B, K, M = 16384, 32, 64
    near, far = 2.0, 6.0
    mu = jnp.zeros((3,))
    sigma = jnp.asarray(8.0)
    occ = occ_lib.init_grid(128, 0.01)
    # ~5% occupied grid (steady-state-ish)
    bits = jax.random.bernoulli(jax.random.PRNGKey(0), 0.05,
                                occ.mask.shape)
    occ = occ._replace(mask=bits.astype(occ.mask.dtype))

    keys = [jax.random.PRNGKey(i) for i in range(3)]
    rays = [
        (jax.random.normal(k, (B, 3)),
         jax.random.normal(jax.random.fold_in(k, 1), (B, 3)))
        for k in keys
    ]

    def make(mode):
        @jax.jit
        def f(ro_rd):
            ro, rd = ro_rd
            t, dt = sampling.occupancy_guided_ts(
                jax.random.PRNGKey(9), ro, rd, occ, mu, sigma,
                near, far, K, num_probe=M, dt_mode=mode)
            return t + dt
        return f

    for mode in ("clip", "mass"):
        dt = timed(make(mode), rays)
        print(f"guided_ts {mode:5s}: {dt*1e3:7.1f} ms")

    # the mass tail alone, from precomputed (t, m)
    h = (far - near) / M

    @jax.jit
    def mass_tail(args):
        t, m = args
        W = jnp.sum(m, axis=-1, keepdims=True)
        interval = jnp.floor((t - near) / h)
        onehot = (interval[..., None]
                  == jnp.arange(M, dtype=jnp.float32)[None, None, :])
        m_t = jnp.sum(jnp.where(onehot, m[..., None, :], 0.0), axis=-1)
        dt = h * W / (K * jnp.maximum(m_t, 1e-8))
        dt = jnp.where(m_t >= 1.0 - 1e-6, dt, jnp.minimum(dt, h))
        return jnp.where(W > 1e-6, dt, (far - near) / K)

    tm_in = [
        (jax.random.uniform(k, (B, K)) * 4.0 + 2.0,
         jax.random.bernoulli(jax.random.fold_in(k, 2), 0.1,
                              (B, M)).astype(jnp.float32))
        for k in keys
    ]
    print(f"mass tail alone: {timed(mass_tail, tm_in)*1e3:7.1f} ms")

    # sample_pdf alone (shared)
    bins = near + jnp.arange(M + 1, dtype=jnp.float32) * h

    @jax.jit
    def pdf_only(args):
        _, m = args
        bb = jnp.broadcast_to(bins, m.shape[:-1] + (M + 1,))
        return sampling.sample_pdf(jax.random.PRNGKey(9), bb, m, K)

    print(f"sample_pdf alone: {timed(pdf_only, tm_in)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
