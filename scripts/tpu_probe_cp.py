"""Decompose the CP-encoder train step into its cost components on TPU.

The CP factor-line encoder (ops/lowrank.py) moves the encoding cost from
random memory tiles to MXU FLOPs; this probe locates the new hot spot
(two-hot build + matmul vs guided placement vs MLP vs optimizer) so the
next optimisation targets the right stage, and sweeps rank / block size.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_cp.py
"""

import dataclasses
import os
import time

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(fn, inputs, iters=6):
    fn(inputs[0])
    sync(fn(inputs[0]))
    t0 = time.perf_counter()
    for i in range(iters):
        sync(fn(inputs[i % len(inputs)]))
    return (time.perf_counter() - t0) / iters


def main():
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.ops import dense_grid
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import lowrank as lr
    from human_body_reconstruction_tpu.ops import occupancy
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.ops import sampling
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    B = int(os.environ.get("PROF_B", 32768))
    K = int(os.environ.get("PROF_K", 32))
    N = B * K
    print(f"devices: {jax.devices()}  B={B} K={K} N={N}", flush=True)

    ds = synthetic.make_dataset(n_views=4, H=64, W=64)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"], ds["c2ws"],
                                   ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    keys = [jax.random.PRNGKey(i) for i in range(3)]
    pts_n = [jax.random.uniform(k, (N, 3)) * 8.0 - 4.0 for k in keys]

    # encoder alone: rank and block sweeps, fwd and f+b
    for rank in (16, 32, 48):
        cfg = C.HashConfig(num_levels=8, n_min=16, n_max=2048,
                           variant="cp", cp_rank=rank)
        cfg = dataclasses.replace(
            cfg, dense_levels=dense_grid.auto_dense_levels(cfg))
        lines = lr.init_lines(jax.random.PRNGKey(0), cfg)

        for blk in (0, 16384, 65536):
            @jax.jit
            def f_fwd(x, lines=lines, cfg=cfg, blk=blk):
                return lr.cp_encode(lines, x, scene["mu"], scene["sigma"],
                                    cfg, block=blk)

            @jax.jit
            def f_fb(x, lines=lines, cfg=cfg, blk=blk):
                def loss(ls):
                    return jnp.sum(lr.cp_encode(
                        ls, x, scene["mu"], scene["sigma"], cfg,
                        block=blk) ** 2)
                return jax.grad(loss)(lines)

            print(f"cp r{rank:2d} blk={blk or 'auto':>6}: "
                  f"fwd {timeit(f_fwd, pts_n)*1e3:7.1f} ms   "
                  f"f+b {timeit(f_fb, pts_n)*1e3:7.1f} ms", flush=True)

    # the guided-placement + full-step context at rank 32
    cfg32 = C.HashConfig(num_levels=8, n_min=16, n_max=2048,
                         variant="cp", cp_rank=32)
    cfg32 = dataclasses.replace(
        cfg32, dense_levels=dense_grid.auto_dense_levels(cfg32))
    pcfg = C.PipelineConfig(
        hash=cfg32,
        render=C.RenderConfig(num_samples=128, occupancy=True,
                              occupancy_resolution=128, compact_samples=K,
                              occ_guided=True, occ_probes=64,
                              occ_dt="mass"),
        train=C.TrainConfig(ray_batch=B))
    occ = occupancy.init_grid(128, threshold=0.5)
    for k in range(4):
        occ = occupancy.update(occ, lambda p: synthetic.blob_field(p)[1],
                               jax.random.PRNGKey(k), scene["mu"],
                               scene["sigma"], num_cells=128 ** 3)
    print(f"occ frac: {float(occupancy.occupied_fraction(occ)):.3f}",
          flush=True)

    rays = []
    for k in keys:
        o, d, n, gt = step_lib.sample_ray_batch(k, ds["images"], ds["c2ws"],
                                                ds["K"], B)
        rays.append((o, d))

    @jax.jit
    def f_guided(b):
        o, d = b
        t, dt = sampling.occupancy_guided_ts(
            jax.random.PRNGKey(9), o, d, occ, scene["mu"], scene["sigma"],
            2.0, 6.0, K, num_probe=64, dt_mode="mass")
        return t + dt

    print(f"guided placement M=64:  {timeit(f_guided, rays)*1e3:.1f} ms",
          flush=True)

    # MLP alone at N points
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    mlp = mlp_lib.init_mlp3d(k2, pcfg.mlp, cfg32.out_dim,
                             pcfg.dir_enc.out_dim)
    feats = [jax.random.normal(k, (N, cfg32.out_dim), jnp.bfloat16)
             for k in keys]
    dirs = jax.random.normal(jax.random.PRNGKey(5),
                             (N, pcfg.dir_enc.out_dim), jnp.bfloat16)

    @jax.jit
    def f_mlp(f):
        return mlp_lib.apply_mlp3d(mlp, f, dirs, pcfg.mlp,
                                   compute_dtype=jnp.bfloat16)

    print(f"mlp fwd (N={N}):        {timeit(f_mlp, feats)*1e3:.1f} ms",
          flush=True)

    # full train step (the bench config)
    params = {**he.init_encoder(k1, cfg32),
              "mlp": mlp}
    state, tx = state_lib.create_train_state(params, pcfg.train, 1000,
                                             occ=occ)

    def run_step(state):
        return step_lib.train_step(state, scene, ds["images"], ds["c2ws"],
                                   ds["K"], jax.random.PRNGKey(0), pcfg,
                                   tx, B)

    state, m = run_step(state)
    float(m["loss"])
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        state, m = run_step(state)
        float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"full cp_r32 step:       {dt*1e3:.1f} ms  "
          f"({B/dt/1e3:.1f}k rays/s)", flush=True)


if __name__ == "__main__":
    main()
