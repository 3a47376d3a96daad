"""Decompose the bench train step into its cost components on TPU.

Round-2 question: the int8+dense encoder's measured forward (~268 ms at
N=1.57M) sits ~4x above its lookup floor (~9.4M tile-priced lookups
~= 50-70 ms).  This run breaks the encoder into sub-stages (table pack,
gather, unpack+assemble, dense levels) and times the occupancy-guided
sampler, so the next optimisation targets the real hot spot.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_profile_step.py
"""

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
    from human_body_reconstruction_tpu.ops import dense_grid as dg
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import occupancy
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.ops import sampling
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    import os

    B = int(os.environ.get("PROF_B", 32768))
    S = 128
    K = int(os.environ.get("PROF_K", 48))
    N = B * K

    print(f"devices: {jax.devices()}  B={B} S={S} K={K} N=B*K={N}")

    ds = synthetic.make_dataset(n_views=4, H=64, W=64)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"], ds["c2ws"],
                                   ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}

    occ_res = int(os.environ.get("PROF_OCC_RES", 128))

    def fresh_occ():
        occ = occupancy.init_grid(occ_res, threshold=0.5)
        for k in range(4):
            occ = occupancy.update(occ, lambda p: synthetic.blob_field(p)[1],
                                   jax.random.PRNGKey(k), scene["mu"],
                                   scene["sigma"], num_cells=occ_res ** 3)
        return occ

    occ = fresh_occ()

    keys = [jax.random.PRNGKey(i) for i in range(3)]
    batches = []
    for k in keys:
        o, d, n, gt = step_lib.sample_ray_batch(k, ds["images"], ds["c2ws"],
                                                ds["K"], B)
        t = jnp.linspace(2.0, 6.0, S)
        t = jnp.broadcast_to(t, (B, S)) + jax.random.uniform(k, (B, S)) * 0.03
        pts = o[:, None, :] + d[:, None, :] * t[..., None]
        batches.append((o, d, n, gt, t, pts))

    # 1. occupancy lookup over all B*S probe points
    @jax.jit
    def f_occ(b):
        return occupancy.lookup(occ, b[5], scene["mu"], scene["sigma"])

    print(f"occ lookup (B*S={B*S}): {timeit(f_occ, batches)*1e3:.1f} ms")

    # 2. compaction block exactly as shipped (top_k + takes + pts recompute)
    @jax.jit
    def f_compact(b):
        o, d, n, gt, t, pts = b
        mask = occupancy.lookup(occ, pts, scene["mu"], scene["sigma"])
        sort_key = ((1.0 - mask) * S
                    + jnp.arange(S, dtype=jnp.float32)[None, :])
        _, order = jax.lax.top_k(-sort_key, K)
        t2 = jnp.take_along_axis(t, order, axis=-1)
        m2 = jnp.take_along_axis(mask, order, axis=-1)
        p2 = o[:, None, :] + d[:, None, :] * t2[..., None]
        return t2 + m2[:, :1] + p2[:, 0, :1]

    print(f"occ + compact block:    {timeit(f_compact, batches)*1e3:.1f} ms")

    # 2b. occupancy-GUIDED placement at M probes
    for M in (128, 64, 32):
        @jax.jit
        def f_guided(b, M=M):
            o, d = b[0], b[1]
            t, dt = sampling.occupancy_guided_ts(
                jax.random.PRNGKey(9), o, d, occ, scene["mu"],
                scene["sigma"], 2.0, 6.0, K, num_probe=M)
            return t + dt

        print(f"guided placement M={M:3d}: "
              f"{timeit(f_guided, batches)*1e3:.1f} ms")

    # 3. encoder at N compacted points — coarse + granular
    pts_n = [jax.random.uniform(k, (N, 3)) * 8.0 - 4.0 for k in keys]

    cfg16 = C.HashConfig(stochastic_train=True, packed=True,
                         grad_subsample=True, hw_rng=True)
    t16 = he.init_table(jax.random.PRNGKey(0), cfg16)
    cfg8 = C.HashConfig(num_levels=8, features_per_level=4,
                        stochastic_train=True, packed=True,
                        pack_format="int8", grad_subsample=True, hw_rng=True,
                        dense_levels=2)
    enc8 = he.init_encoder(jax.random.PRNGKey(0), cfg8)
    Lh = cfg8.num_hashed_levels

    @jax.jit
    def f_enc16(x):
        return he.hash_encode_stochastic_packed(t16, x, scene["mu"],
                                                scene["sigma"], cfg16,
                                                jax.random.PRNGKey(7))

    @jax.jit
    def f_enc8(x):
        return he.encode_params(enc8, x, scene["mu"], scene["sigma"], cfg8,
                                key=jax.random.PRNGKey(7), stochastic=True)

    @jax.jit
    def f_enc8_bwd(x):
        def loss(p):
            return jnp.sum(he.encode_params(
                p, x, scene["mu"], scene["sigma"], cfg8,
                key=jax.random.PRNGKey(7), stochastic=True) ** 2)
        return jax.grad(loss)(enc8)

    print(f"enc16 bf16 fwd:         {timeit(f_enc16, pts_n)*1e3:.1f} ms")
    print(f"enc8 int8+dense fwd:    {timeit(f_enc8, pts_n)*1e3:.1f} ms")
    print(f"enc8 int8+dense f+b:    {timeit(f_enc8_bwd, pts_n)*1e3:.1f} ms")

    # 3b. granular int8 sub-stages (hashed levels only)
    @jax.jit
    def f_idx(x):
        return he._stoch_packed_indices(x, scene["mu"], scene["sigma"],
                                        cfg8, jax.random.PRNGKey(7))

    rows_c = [f_idx(x) for x in pts_n]                    # (Lh, N) each

    @jax.jit
    def f_pack(_x):
        w, s = he.pack_table_int8(enc8["table"])
        return jnp.sum(w[:8].astype(jnp.float32)) + jnp.sum(s)

    @jax.jit
    def f_gather(rows):
        w, _ = he.pack_table_int8(enc8["table"])
        return jnp.take(w, rows)

    words_c = [f_gather(r) for r in rows_c]

    @jax.jit
    def f_unpack(words):
        _, s = he.pack_table_int8(enc8["table"])
        feats = [he._unpack_int8(words, f, s[:, None]) for f in range(4)]
        return he._features_to_out(feats)

    print(f"  idx (hash) only:      {timeit(f_idx, pts_n)*1e3:.1f} ms")
    print(f"  pack table only:      {timeit(f_pack, pts_n)*1e3:.1f} ms")
    print(f"  pack+gather (Lh*N={Lh*N}): {timeit(f_gather, rows_c)*1e3:.1f} ms")
    print(f"  unpack+assemble:      {timeit(f_unpack, words_c)*1e3:.1f} ms")

    # 3c. dense levels alone, current block size vs bigger blocks
    for blk in (0, 65536, 131072):
        @jax.jit
        def f_dense(x, blk=blk):
            return dg.dense_encode(enc8["dense"], x, scene["mu"],
                                   scene["sigma"], cfg8, block=blk)

        @jax.jit
        def f_dense_bwd(x, blk=blk):
            def loss(g):
                return jnp.sum(dg.dense_encode(
                    g, x, scene["mu"], scene["sigma"], cfg8,
                    block=blk) ** 2)
            return jax.grad(loss)(enc8["dense"])

        print(f"  dense fwd blk={blk or 'auto':>6}: "
              f"{timeit(f_dense, pts_n)*1e3:.1f} ms   "
              f"f+b: {timeit(f_dense_bwd, pts_n)*1e3:.1f} ms")

    # 4. MLP fwd+bwd at N points
    mcfg = C.MLPConfig()
    pe = C.PosEncConfig()
    mlp = mlp_lib.init_mlp3d(jax.random.PRNGKey(1), mcfg, 32, pe.out_dim)
    feats = [jax.random.normal(k, (N, 32)) for k in keys]
    dirs = jax.random.normal(jax.random.PRNGKey(2), (N, pe.out_dim))

    @jax.jit
    def f_mlp(f):
        def loss(m):
            rgb, dens = mlp_lib.apply_mlp3d(m, f, dirs, mcfg,
                                            compute_dtype=jnp.bfloat16)
            return jnp.sum(rgb) + jnp.sum(dens)
        return jax.grad(loss)(mlp)

    print(f"MLP fwd+bwd:            {timeit(f_mlp, feats)*1e3:.1f} ms")

    # 5. full train steps
    def full_step_time(cfg):
        params = {
            **he.init_encoder(jax.random.PRNGKey(0), cfg.hash),
            "mlp": mlp_lib.init_mlp3d(jax.random.PRNGKey(1), cfg.mlp,
                                      cfg.hash.out_dim, cfg.dir_enc.out_dim),
        }
        # train_step donates its state (occ included) — every config
        # needs its own occupancy buffers, not the shared `occ`
        state, tx = state_lib.create_train_state(params, cfg.train, 1000,
                                                 occ=fresh_occ())

        def run(state):
            return step_lib.train_step(state, scene, ds["images"],
                                       ds["c2ws"], ds["K"],
                                       jax.random.PRNGKey(0), cfg, tx, B)

        for _ in range(2):
            state, m = run(state)
        float(m["loss"])
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            state, m = run(state)
            float(m["loss"])
        return (time.perf_counter() - t0) / iters

    rocc = C.RenderConfig(num_samples=S, occupancy=True,
                          occupancy_resolution=occ_res, compact_samples=K)
    rguided = C.RenderConfig(num_samples=S, occupancy=True,
                             occupancy_resolution=occ_res, compact_samples=K,
                             occ_guided=True, occ_probes=64)
    h16 = C.HashConfig(stochastic_train=True, packed=True,
                       grad_subsample=True, hw_rng=True)
    import dataclasses

    cfg8_lvl = dataclasses.replace(cfg8, grad_level_subsample=True)
    for name, cfg in [
        ("steady_state(16/2 bf16)", C.PipelineConfig(
            hash=h16, render=rocc, train=C.TrainConfig(ray_batch=B))),
        ("int8_dense(8/4)", C.PipelineConfig(
            hash=cfg8, render=rocc, train=C.TrainConfig(ray_batch=B))),
        ("guided64 int8_dense", C.PipelineConfig(
            hash=cfg8, render=rguided, train=C.TrainConfig(ray_batch=B))),
        ("guided64 int8_dense lvl-sub", C.PipelineConfig(
            hash=cfg8_lvl, render=rguided, train=C.TrainConfig(ray_batch=B))),
        ("guided64 16/2 bf16", C.PipelineConfig(
            hash=h16, render=rguided, train=C.TrainConfig(ray_batch=B))),
    ]:
        dt = full_step_time(cfg)
        print(f"step {name}: {dt*1e3:.1f} ms ({B/dt/1e3:.1f}k rays/s)")


if __name__ == "__main__":
    main()
