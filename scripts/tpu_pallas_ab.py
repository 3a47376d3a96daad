"""Pallas CP kernel A/B on the real chip (follow-up to tpu_roofline_cp).

Times the VMEM-resident kernel (ops/cp_pallas.py) against the XLA
lax.map path: encode fwd / fwd+bwd across point-block sizes, then the
full scan8 train step, at rank 16 and rank 32.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_pallas_ab.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

PEAK = 197e12  # v5e bf16


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


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
    from human_body_reconstruction_tpu.ops import cp_pallas, dense_grid, lowrank
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import occupancy
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    print("devices:", jax.devices(), flush=True)
    B, S, K = 32768, 128, 32
    N = B * K
    results = {}

    for rank in (16, 32):
        cp_hash = C.HashConfig(num_levels=8, n_min=16, n_max=2048,
                               variant="cp", cp_rank=rank, cp_impl="xla")
        cp_hash = dataclasses.replace(
            cp_hash, dense_levels=dense_grid.auto_dense_levels(cp_hash))
        sizes = lowrank.cp_line_sizes(cp_hash)
        _, _, total_pad = cp_pallas.padded_layout(sizes)
        c_pad = ((len(sizes) * rank + 127) // 128) * 128
        flops_pal = 2 * 3 * total_pad * c_pad

        lines = lowrank.init_lines(jax.random.PRNGKey(0), cp_hash)
        mu = jnp.zeros(3)
        sigma = jnp.float32(8.0)
        pts = [jax.random.uniform(jax.random.PRNGKey(i), (N, 3)) * 7.0
               for i in range(3)]

        for blk in (256, 512, 1024):
            def p_fwd(x, blk=blk):
                return cp_pallas.cp_encode_pallas(lines, x, mu, sigma,
                                                  cp_hash, block=blk)

            def p_fb(x, blk=blk):
                return jax.grad(lambda l: jnp.sum(
                    cp_pallas.cp_encode_pallas(l, x, mu, sigma, cp_hash,
                                               block=blk) ** 2))(lines)

            try:
                dt = timeit(jax.jit(p_fwd), pts)
                tf = flops_pal * N / dt / 1e12
                results[f"r{rank} pallas fwd blk={blk}"] = dict(
                    ms=round(dt * 1e3, 2), tflops=round(tf, 1),
                    mfu=round(tf * 1e12 / PEAK, 3))
                print(f"r{rank} pallas fwd blk={blk}: {dt*1e3:.1f} ms "
                      f"{tf:.1f} TF/s", flush=True)
                dt = timeit(jax.jit(p_fb), pts)
                tf = 3 * flops_pal * N / dt / 1e12
                results[f"r{rank} pallas f+b blk={blk}"] = dict(
                    ms=round(dt * 1e3, 2), tflops=round(tf, 1),
                    mfu=round(tf * 1e12 / PEAK, 3))
                print(f"r{rank} pallas f+b blk={blk}: {dt*1e3:.1f} ms "
                      f"{tf:.1f} TF/s", flush=True)
            except Exception as e:
                results[f"r{rank} pallas blk={blk}"] = dict(
                    error=repr(e)[:300])
                print(f"r{rank} pallas blk={blk} FAILED: {e!r}"[:400],
                      flush=True)

        # full train step A/B at this rank
        ds = synthetic.make_dataset(n_views=4, H=64, W=64)
        lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"],
                                       ds["c2ws"], ds["near"], ds["far"])
        scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
                 "min_bound": lo, "max_bound": hi}
        render = C.RenderConfig(num_samples=S, occupancy=True,
                                occupancy_resolution=128,
                                compact_samples=K, occ_guided=True,
                                occ_probes=64)

        for impl in ("pallas",) if rank == 16 else ("pallas", "xla"):
            cfgh = dataclasses.replace(cp_hash, cp_impl=impl)
            cfg = C.PipelineConfig(hash=cfgh, render=render,
                                   train=C.TrainConfig(ray_batch=B))
            params = {**he.init_encoder(jax.random.PRNGKey(0), cfg.hash),
                      "mlp": mlp_lib.init_mlp3d(
                          jax.random.PRNGKey(1), cfg.mlp, cfg.hash.out_dim,
                          cfg.dir_enc.out_dim)}
            occ2 = occupancy.init_grid(128, threshold=0.5)
            for k in range(4):
                occ2 = occupancy.update(
                    occ2, lambda p: synthetic.blob_field(p)[1],
                    jax.random.PRNGKey(k), scene["mu"], scene["sigma"],
                    num_cells=128 ** 3)
            state, tx = state_lib.create_train_state(params, cfg.train,
                                                     1000, occ=occ2)

            def run(state):
                return step_lib.train_step_multi(
                    state, scene, ds["images"], ds["c2ws"], ds["K"],
                    jax.random.PRNGKey(0), cfg, tx, B, 8)

            try:
                for _ in range(2):
                    state, m = run(state)
                float(m["loss"])
                t0 = time.perf_counter()
                for _ in range(3):
                    state, m = run(state)
                    float(m["loss"])
                dt = (time.perf_counter() - t0) / 3
                rate = B * 8 / dt
                results[f"r{rank} step scan8 {impl}"] = dict(
                    rays_per_s=round(rate, 1))
                print(f"r{rank} step scan8 {impl}: {rate/1e3:.1f}k rays/s",
                      flush=True)
            except Exception as e:
                results[f"r{rank} step scan8 {impl}"] = dict(
                    error=repr(e)[:300])
                print(f"r{rank} step {impl} FAILED: {e!r}"[:400],
                      flush=True)

    payload = json.dumps(results, indent=1)
    print(payload, flush=True)
    with open("pallas_ab.json", "w") as f:
        f.write(payload)


if __name__ == "__main__":
    main()
