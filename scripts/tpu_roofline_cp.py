"""CP-step roofline on the real chip: where do 132k rays/s go?

VERDICT r2 item 1: publish a FLOP/byte accounting and MFU figure for
the CP train step, profile the components, A/B the Pallas kernel
(ops/cp_pallas.py) against the XLA lax.map formulation.

Writes one JSON payload to stdout (and --out file) with:
  * analytic FLOPs/bytes per point for the CP encode,
  * measured times for encode fwd / fwd+bwd under both impls and
    several point-block sizes -> achieved TFLOP/s and MFU,
  * component times (MLP, guided sampling, occupancy probes),
  * full train-step rates (XLA vs pallas impl, scan8).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_roofline_cp.py
"""

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = {  # TFLOP/s per chip
    "v4": 275.0, "v5e": 197.0, "v5litepod": 197.0, "v5p": 459.0,
    "v6e": 918.0,
}


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="roofline_cp.json")
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.ops import cp_pallas, dense_grid, lowrank
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import occupancy, sampling
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    dev = jax.devices()[0]
    kind = dev.device_kind
    peak = next((v for k, v in PEAK_BF16.items()
                 if k in kind.lower().replace(" ", "")), 197.0)
    print(f"device: {dev} kind={kind} peak_bf16={peak} TF/s", flush=True)

    B, S, K = 32768, 128, 32
    N = B * K
    out = {"device": str(kind), "peak_bf16_tflops": peak,
           "B": B, "S": S, "K": K, "N": N, "rank": args.rank}

    cp_hash = C.HashConfig(num_levels=8, n_min=16, n_max=2048,
                           variant="cp", cp_rank=args.rank, cp_impl="xla")
    cp_hash = dataclasses.replace(
        cp_hash, dense_levels=dense_grid.auto_dense_levels(cp_hash))
    sizes = lowrank.cp_line_sizes(cp_hash)
    n_lvl = len(sizes)
    _, padded, total_pad = cp_pallas.padded_layout(sizes)
    c = n_lvl * args.rank
    c_pad = ((c + 127) // 128) * 128

    # analytic accounting (per point): fwd two-hot matmul FLOPs
    flops_fwd_xla = 2 * 3 * sum(sizes) * c          # XLA: exact columns
    flops_fwd_pal = 2 * 3 * total_pad * c_pad       # pallas: padded
    out["cp_levels"] = sizes
    out["flops_per_point_fwd"] = {"xla": flops_fwd_xla,
                                  "pallas_padded": flops_fwd_pal}
    # W bytes per point (bf16, fwd once + bwd rebuild): XLA writes+reads
    out["w_bytes_per_point_xla"] = 2 * 2 * 3 * sum(sizes)
    print(f"levels={sizes} sumG={sum(sizes)} pad={total_pad} C={c}->"
          f"{c_pad}; fwd FLOP/pt xla={flops_fwd_xla/1e6:.2f}M "
          f"pallas={flops_fwd_pal/1e6:.2f}M", flush=True)

    key = jax.random.PRNGKey(0)
    lines = lowrank.init_lines(key, cp_hash)
    mu = jnp.zeros(3)
    sigma = jnp.float32(8.0)
    pts = [jax.random.uniform(jax.random.PRNGKey(i), (N, 3)) * 7.0
           for i in range(3)]

    results = {}

    def record(name, dt, flops_pt):
        tf = flops_pt * N / dt / 1e12
        results[name] = {"ms": round(dt * 1e3, 2),
                         "tflops": round(tf, 1),
                         "mfu": round(tf / peak, 3)}
        print(f"{name:34s} {dt*1e3:8.1f} ms  {tf:6.1f} TF/s "
              f"MFU={tf/peak:.2f}", flush=True)

    # ---- XLA path, block sweep
    for blk in (0, 8192):
        cfgx = dataclasses.replace(cp_hash, cp_impl="xla")

        def f_fwd(x, blk=blk, cfgx=cfgx):
            return lowrank.cp_encode(lines, x, mu, sigma, cfgx, block=blk)

        def f_fb(x, blk=blk, cfgx=cfgx):
            return jax.grad(lambda l: jnp.sum(lowrank.cp_encode(
                l, x, mu, sigma, cfgx, block=blk) ** 2))(lines)

        record(f"xla fwd blk={blk or 'auto'}",
               timeit(jax.jit(f_fwd), pts, args.iters), flops_fwd_xla)
        record(f"xla f+b blk={blk or 'auto'}",
               timeit(jax.jit(f_fb), pts, args.iters), 3 * flops_fwd_xla)

    # ---- pallas kernel, block sweep
    for blk in (256, 512, 1024):
        def p_fwd(x, blk=blk):
            return cp_pallas.cp_encode_pallas(lines, x, mu, sigma,
                                              cp_hash, block=blk)

        def p_fb(x, blk=blk):
            return jax.grad(lambda l: jnp.sum(cp_pallas.cp_encode_pallas(
                l, x, mu, sigma, cp_hash, block=blk) ** 2))(lines)

        try:
            record(f"pallas fwd blk={blk}",
                   timeit(jax.jit(p_fwd), pts, args.iters), flops_fwd_pal)
            record(f"pallas f+b blk={blk}",
                   timeit(jax.jit(p_fb), pts, args.iters),
                   3 * flops_fwd_pal)
        except Exception as e:  # Mosaic may reject a layout — record it
            results[f"pallas blk={blk}"] = {"error": repr(e)[:400]}
            print(f"pallas blk={blk} FAILED: {e!r}"[:500], flush=True)

    # ---- components: MLP, guided sampling, occupancy probes
    ds = synthetic.make_dataset(n_views=4, H=64, W=64)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"], ds["c2ws"],
                                   ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    occ = occupancy.init_grid(128, threshold=0.5)
    for k in range(4):
        occ = occupancy.update(occ, lambda p: synthetic.blob_field(p)[1],
                               jax.random.PRNGKey(k), scene["mu"],
                               scene["sigma"], num_cells=128 ** 3)

    mcfg = C.MLPConfig()
    pe = C.PosEncConfig()
    mlp = mlp_lib.init_mlp3d(jax.random.PRNGKey(1), mcfg,
                             cp_hash.out_dim, pe.out_dim)
    feats = [jax.random.normal(k, (N, cp_hash.out_dim))
             for k in [jax.random.PRNGKey(i) for i in range(3)]]
    dirs = jax.random.normal(jax.random.PRNGKey(2), (N, pe.out_dim))

    def f_mlp(f):
        return jax.grad(lambda m: jnp.sum(mlp_lib.apply_mlp3d(
            m, f, dirs, mcfg, compute_dtype=jnp.bfloat16)[0]))(mlp)

    dt = timeit(jax.jit(f_mlp), feats, args.iters)
    results["mlp f+b"] = {"ms": round(dt * 1e3, 2)}
    print(f"{'mlp f+b':34s} {dt*1e3:8.1f} ms", flush=True)

    rb = [step_lib.sample_ray_batch(jax.random.PRNGKey(i), ds["images"],
                                    ds["c2ws"], ds["K"], B)[:2]
          for i in range(3)]

    def f_guided(od):
        t, dtv = sampling.occupancy_guided_ts(
            jax.random.PRNGKey(9), od[0], od[1], occ, scene["mu"],
            scene["sigma"], 2.0, 6.0, K, num_probe=64)
        return t + dtv

    dt = timeit(jax.jit(f_guided), rb, args.iters)
    results["guided sampling M=64"] = {"ms": round(dt * 1e3, 2)}
    print(f"{'guided sampling M=64':34s} {dt*1e3:8.1f} ms", flush=True)

    # ---- full train steps
    render = C.RenderConfig(num_samples=S, occupancy=True,
                            occupancy_resolution=128, compact_samples=K,
                            occ_guided=True, occ_probes=64)

    def step_rate(cfgh, scan=8, iters=3):
        cfg = C.PipelineConfig(hash=cfgh, render=render,
                               train=C.TrainConfig(ray_batch=B))
        params = {**he.init_encoder(jax.random.PRNGKey(0), cfg.hash),
                  "mlp": mlp_lib.init_mlp3d(jax.random.PRNGKey(1), cfg.mlp,
                                            cfg.hash.out_dim,
                                            cfg.dir_enc.out_dim)}
        occ2 = occupancy.init_grid(128, threshold=0.5)
        for k in range(4):
            occ2 = occupancy.update(occ2,
                                    lambda p: synthetic.blob_field(p)[1],
                                    jax.random.PRNGKey(k), scene["mu"],
                                    scene["sigma"], num_cells=128 ** 3)
        state, tx = state_lib.create_train_state(params, cfg.train, 1000,
                                                 occ=occ2)

        def run(state):
            return step_lib.train_step_multi(
                state, scene, ds["images"], ds["c2ws"], ds["K"],
                jax.random.PRNGKey(0), cfg, tx, B, scan)

        for _ in range(2):
            state, m = run(state)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = run(state)
            float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        return B * scan / dt

    for impl in ("xla", "pallas"):
        try:
            rate = step_rate(dataclasses.replace(cp_hash, cp_impl=impl))
            results[f"train step scan8 {impl}"] = {
                "rays_per_s": round(rate, 1)}
            print(f"train step scan8 {impl}: {rate/1e3:.1f}k rays/s",
                  flush=True)
        except Exception as e:
            results[f"train step scan8 {impl}"] = {"error": repr(e)[:400]}
            print(f"train step {impl} FAILED: {e!r}"[:500], flush=True)

    out["results"] = results
    payload = json.dumps(out, indent=1)
    print(payload, flush=True)
    with open(args.out, "w") as f:
        f.write(payload)


if __name__ == "__main__":
    main()
