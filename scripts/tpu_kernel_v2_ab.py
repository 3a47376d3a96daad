"""CP Pallas kernel v2 A/B on the real chip (round 4).

Variants of ops/cp_pallas.py under test, against the round-3 kernel
(layout="padded", single W scratch):

  * layout="tight": 8-aligned segment packing — 13.5% fewer executed
    rows (4736 -> 4096 at the flagship ladder) in both the MXU matmul
    and the VPU hat build, identical semantics,
  * fwd_db=True: double-buffered W scratch so axis d+1's VPU hat build
    can overlap axis d's MXU matmul (the build is co-dominant),
  * forward point-tile 256 vs 512.

Measurement discipline (CLAUDE.md): one process, variants interleaved
round-robin so drift can't masquerade as a win; D2H sync per call with
rotating inputs; per-unit compile retry with backoff (the remote
compile helpers have minutes-long outage windows).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/tpu_kernel_v2_ab.py
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


def compile_with_retry(fn, arg, tries=4, backoff=180):
    for i in range(tries):
        try:
            sync(fn(arg))
            return True
        except Exception as e:
            print(f"  compile failed ({e!r})"[:300], flush=True)
            if i == tries - 1:
                return False
            time.sleep(backoff)
    return False


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

    rank = 21
    cp_hash = C.HashConfig(num_levels=8, n_min=16, n_max=2048,
                           variant="cp", cp_rank=rank, cp_impl="xla")
    cp_hash = dataclasses.replace(
        cp_hash, dense_levels=dense_grid.auto_dense_levels(cp_hash))
    sizes = lowrank.cp_line_sizes(cp_hash)
    c_pad = ((len(sizes) * rank + 127) // 128) * 128
    totals = {lay: cp_pallas.get_layout(tuple(sizes), lay)[2]
              for lay in ("padded", "tight")}
    print("sizes:", sizes, "totals:", totals, "c_pad:", c_pad, flush=True)

    lines = lowrank.init_lines(jax.random.PRNGKey(0), cp_hash)
    mu = jnp.zeros(3)
    sigma = jnp.float32(8.0)
    pts = [jax.random.uniform(jax.random.PRNGKey(i), (N, 3)) * 7.0
           for i in range(4)]

    # ---- encode variants, interleaved -------------------------------
    variants = {
        "v1_padded_b256": dict(layout="padded", fwd_db=False, block=256),
        "tight_b256": dict(layout="tight", fwd_db=False, block=256),
        "tight_db_b256": dict(layout="tight", fwd_db=True, block=256),
        "tight_db_b512": dict(layout="tight", fwd_db=True, block=512),
    }
    fns = {}
    for name, kw in variants.items():
        def p_fwd(x, kw=kw):
            return cp_pallas.cp_encode_pallas(
                lines, x, mu, sigma, cp_hash, block=kw["block"],
                layout=kw["layout"], fwd_db=kw["fwd_db"])

        def p_fb(x, kw=kw):
            return jax.grad(lambda l: jnp.sum(
                cp_pallas.cp_encode_pallas(
                    l, x, mu, sigma, cp_hash, block=kw["block"],
                    layout=kw["layout"], fwd_db=kw["fwd_db"]) ** 2))(lines)

        fns[name] = (jax.jit(p_fwd), jax.jit(p_fb))

    alive = {}
    for name, (f_fwd, f_fb) in fns.items():
        print(f"compiling {name} ...", flush=True)
        ok = compile_with_retry(f_fwd, pts[0]) and \
            compile_with_retry(f_fb, pts[0])
        if ok:
            alive[name] = (f_fwd, f_fb)
        else:
            results[f"{name}"] = dict(error="compile failed after retries")

    n_rounds, iters = 3, 3
    times = {name: {"fwd": [], "fb": []} for name in alive}
    for rnd in range(n_rounds):
        for name, (f_fwd, f_fb) in alive.items():
            t0 = time.perf_counter()
            for i in range(iters):
                sync(f_fwd(pts[(rnd * iters + i) % len(pts)]))
            times[name]["fwd"].append((time.perf_counter() - t0) / iters)
            t0 = time.perf_counter()
            for i in range(iters):
                sync(f_fb(pts[(rnd * iters + i) % len(pts)]))
            times[name]["fb"].append((time.perf_counter() - t0) / iters)
        print(f"round {rnd}: " + " | ".join(
            f"{n} fwd {times[n]['fwd'][-1]*1e3:.1f} "
            f"fb {times[n]['fb'][-1]*1e3:.1f} ms" for n in alive),
            flush=True)

    for name in alive:
        lay = variants[name]["layout"]
        fl = 2 * 3 * totals[lay] * c_pad
        dt_f, dt_b = min(times[name]["fwd"]), min(times[name]["fb"])
        results[f"r{rank} {name} fwd"] = dict(
            ms=round(dt_f * 1e3, 2),
            tflops=round(fl * N / dt_f / 1e12, 1),
            mfu=round(fl * N / dt_f / PEAK, 3))
        results[f"r{rank} {name} f+b"] = dict(
            ms=round(dt_b * 1e3, 2),
            tflops=round(3 * fl * N / dt_b / 1e12, 1),
            mfu=round(3 * fl * N / dt_b / PEAK, 3))
    print(json.dumps(results, indent=1), flush=True)

    # ---- full train step scan8: v1 vs tight_db ----------------------
    ds = synthetic.make_dataset(n_views=4, H=64, W=64)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"],
                                   ds["c2ws"], ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    render = C.RenderConfig(num_samples=S, occupancy=True,
                            occupancy_resolution=128,
                            compact_samples=K, occ_guided=True,
                            occ_probes=64, occ_stratified=True)

    step_variants = {
        "step_v1": dict(cp_layout="padded", cp_fwd_db=False),
        "step_tight_db": dict(cp_layout="tight", cp_fwd_db=True),
    }
    step_fns = {}
    for name, kw in step_variants.items():
        cfgh = dataclasses.replace(cp_hash, cp_impl="pallas", **kw)
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

        def run(state, cfg=cfg, tx=tx):
            return step_lib.train_step_multi(
                state, scene, ds["images"], ds["c2ws"], ds["K"],
                jax.random.PRNGKey(0), cfg, tx, B, 8)

        step_fns[name] = (run, state)

    # compile + warm both, then interleave timing rounds
    warm = {}
    for name, (run, state) in step_fns.items():
        print(f"compiling {name} ...", flush=True)
        try:
            for _ in range(2):
                state, m = run(state)
            float(m["loss"])
            warm[name] = (run, state)
        except Exception as e:
            results[name] = dict(error=repr(e)[:300])
            print(f"{name} FAILED: {e!r}"[:400], flush=True)

    rates = {name: [] for name in warm}
    for rnd in range(3):
        for name, (run, state) in warm.items():
            t0 = time.perf_counter()
            for _ in range(3):
                state, m = run(state)
                float(m["loss"])
            dt = (time.perf_counter() - t0) / 3
            warm[name] = (run, state)
            rates[name].append(B * 8 / dt)
        print(f"step round {rnd}: " + " | ".join(
            f"{n} {rates[n][-1]/1e3:.1f}k" for n in warm), flush=True)
    for name in warm:
        results[name] = dict(rays_per_s=round(max(rates[name]), 1),
                             all=[round(r, 1) for r in rates[name]])

    payload = json.dumps(results, indent=1)
    print(payload, flush=True)
    with open("kernel_v2_ab.json", "w") as f:
        f.write(payload)


if __name__ == "__main__":
    main()
