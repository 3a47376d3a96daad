"""Bisect the deterministic compile-helper crash on the CP r32
single-step train HLO (quality-matrix shape: B=16384, warmup phase =
occ None, full 128-sample ladder -> N=2.1M points).

Each probe jits ONE candidate and reports compiled/crashed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_bisect_r32.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp


def main():
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.ops import cp_pallas, dense_grid, lowrank
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    print("devices:", jax.devices(), flush=True)
    results = {}

    def probe(name, fn):
        t0 = time.perf_counter()
        try:
            out = fn()
            s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                              .astype(jnp.float32)))
            results[name] = {"ok": True,
                             "s": round(time.perf_counter() - t0, 1)}
            print(f"{name}: OK ({time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:
            results[name] = {"ok": False, "error": repr(e)[:200]}
            print(f"{name}: FAIL {e!r}"[:300], flush=True)

    def mkcfg(rank):
        hcfg = C.HashConfig(num_levels=8, n_min=16, n_max=2048,
                            variant="cp", cp_rank=rank)
        return dataclasses.replace(
            hcfg, dense_levels=dense_grid.auto_dense_levels(hcfg))

    mu = jnp.zeros(3)
    sigma = jnp.float32(8.0)

    # 1. bare encode fwd at the failing shapes (N = 16384*128 = 2.1M)
    for rank, n in ((32, 16384 * 128), (32, 16384 * 32), (16, 16384 * 128)):
        hcfg = mkcfg(rank)
        lines = lowrank.init_lines(jax.random.PRNGKey(0), hcfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3)) * 7.0
        probe(f"encode fwd r{rank} N={n}",
              lambda lines=lines, x=x, hcfg=hcfg: jax.jit(
                  lambda l, xx: cp_pallas.cp_encode_pallas(
                      l, xx, mu, sigma, hcfg))(lines, x))

    # 2. encode fwd+bwd at the failing shapes
    for rank, n in ((32, 16384 * 128),):
        hcfg = mkcfg(rank)
        lines = lowrank.init_lines(jax.random.PRNGKey(0), hcfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3)) * 7.0
        probe(f"encode f+b r{rank} N={n}",
              lambda lines=lines, x=x, hcfg=hcfg: jax.jit(
                  lambda l, xx: jax.grad(lambda ll: jnp.sum(
                      cp_pallas.cp_encode_pallas(ll, xx, mu, sigma,
                                                 hcfg) ** 2))(l))(lines, x))

    # 3. the actual failing unit: unculled single train_step, B=16384
    ds = synthetic.make_dataset(n_views=4, H=64, W=64)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"], ds["c2ws"],
                                   ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    for rank in (32,):
        hcfg = mkcfg(rank)
        cfg = C.PipelineConfig(
            hash=hcfg,
            render=C.RenderConfig(num_samples=128, occupancy=True,
                                  occupancy_resolution=128,
                                  compact_samples=32, occ_guided=True,
                                  occ_probes=64, occ_dt="mass"),
            train=C.TrainConfig(ray_batch=16384))
        params = {**he.init_encoder(jax.random.PRNGKey(0), cfg.hash),
                  "mlp": mlp_lib.init_mlp3d(jax.random.PRNGKey(1), cfg.mlp,
                                            cfg.hash.out_dim,
                                            cfg.dir_enc.out_dim)}
        state, tx = state_lib.create_train_state(params, cfg.train, 100,
                                                 occ=None)

        def one(state=state, cfg=cfg, tx=tx):
            s2, m = step_lib.train_step(state, scene, ds["images"],
                                        ds["c2ws"], ds["K"],
                                        jax.random.PRNGKey(0), cfg, tx,
                                        16384)
            return m["loss"]

        probe(f"train_step r{rank} B=16384 occ=None", one)

        # 4. same with the XLA encode impl (is it pallas-specific?)
        cfg_x = dataclasses.replace(
            cfg, hash=dataclasses.replace(cfg.hash, cp_impl="xla"))
        params2 = {**he.init_encoder(jax.random.PRNGKey(0), cfg_x.hash),
                   "mlp": mlp_lib.init_mlp3d(jax.random.PRNGKey(1),
                                             cfg_x.mlp, cfg_x.hash.out_dim,
                                             cfg_x.dir_enc.out_dim)}
        state2, tx2 = state_lib.create_train_state(params2, cfg_x.train,
                                                   100, occ=None)

        def one_x(state=state2, cfg=cfg_x, tx=tx2):
            s2, m = step_lib.train_step(state, scene, ds["images"],
                                        ds["c2ws"], ds["K"],
                                        jax.random.PRNGKey(0), cfg, tx,
                                        16384)
            return m["loss"]

        probe(f"train_step r{rank} B=16384 occ=None XLA impl", one_x)

    payload = json.dumps(results, indent=1)
    print(payload, flush=True)
    with open("bisect_r32.json", "w") as f:
        f.write(payload)


if __name__ == "__main__":
    main()
