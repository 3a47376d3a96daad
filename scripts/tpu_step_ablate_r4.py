"""Round-4 scan8-step ablation profile of the CP flagship on TPU.

Round-3 lesson (docs/PERF_NOTES.md "the MLP was never slow"): never
time a standalone component below ~2x the ~35 ms tunnel sync floor.
Here every number is a FUSED 8-step scan rate (floor share ~4 ms/step)
and each component cost is the DIFF between the full step and an
ablated step, all variants interleaved in one process so drift cannot
masquerade as a win.

Ablations (flagship cp_r21 tight_db, B=32768, S=128, K=32, M=64):
  full         the bench cp_r21_guided_k32_scan8_strat step
  no_place     occupancy/guided placement off, plain stratified K=32
               (same encode N) -> diff = probes + inverse-CDF + mass-dt
               + render-time occupancy masking
  probes32     M=64 -> 32 occupancy probe intervals
  k24          compact 24 -> encode/MLP N x0.75 (K-scaling slope and a
               candidate operating point)
  tiny_mlp     4x narrower MLP -> diff ~ 3/4 of MLP cost
  short_ladder num_levels 5 (dense + 3 CP levels, Sigma_G 454 vs 4044)
               -> diff ~ the fine-level encode cost
  sgd          adam -> plain sgd -> diff = optimizer cost
  scan16       16-step scan -> halves the per-dispatch share

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/tpu_step_ablate_r4.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import optax


def main():
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.ops import dense_grid, lowrank
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import occupancy
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    print("devices:", jax.devices(), flush=True)
    B, S, K = 32768, 128, 32
    results = {}

    base_hash = C.HashConfig(num_levels=8, n_min=16, n_max=2048,
                             variant="cp", cp_rank=21, cp_impl="pallas")
    base_hash = dataclasses.replace(
        base_hash, dense_levels=dense_grid.auto_dense_levels(base_hash))
    base_render = C.RenderConfig(num_samples=S, occupancy=True,
                                 occupancy_resolution=128,
                                 compact_samples=K, occ_guided=True,
                                 occ_probes=64, occ_stratified=True)

    ds = synthetic.make_dataset(n_views=4, H=64, W=64)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"],
                                   ds["c2ws"], ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    occ_grid = occupancy.init_grid(128, threshold=0.5)
    for k in range(4):
        occ_grid = occupancy.update(
            occ_grid, lambda p: synthetic.blob_field(p)[1],
            jax.random.PRNGKey(k), scene["mu"], scene["sigma"],
            num_cells=128 ** 3)

    def variant(hash_kw=None, render_kw=None, mlp_kw=None, opt="adam",
                scan=8):
        cfgh = (dataclasses.replace(base_hash, **hash_kw)
                if hash_kw else base_hash)
        rnd = (dataclasses.replace(base_render, **render_kw)
               if render_kw else base_render)
        mlp = (C.MLPConfig(**mlp_kw) if mlp_kw else C.MLPConfig())
        cfg = C.PipelineConfig(hash=cfgh, render=rnd, mlp=mlp,
                               train=C.TrainConfig(ray_batch=B))
        params = {**he.init_encoder(jax.random.PRNGKey(0), cfg.hash),
                  "mlp": mlp_lib.init_mlp3d(
                      jax.random.PRNGKey(1), cfg.mlp, cfg.hash.out_dim,
                      cfg.dir_enc.out_dim)}
        # per-variant COPY of the occupancy grid: train_step_multi
        # donates its state, so a shared grid would be deleted by the
        # first variant's first call and break every later variant
        occ_local = jax.tree.map(jnp.copy, occ_grid)
        if opt == "adam":
            state, tx = state_lib.create_train_state(params, cfg.train,
                                                     1000, occ=occ_local)
        else:
            tx = optax.sgd(1e-3)
            state = state_lib.TrainState(
                step=jnp.int32(0), params=params,
                opt_state=tx.init(params), occ=occ_local)

        def run(state, cfg=cfg, tx=tx, scan=scan):
            return step_lib.train_step_multi(
                state, scene, ds["images"], ds["c2ws"], ds["K"],
                jax.random.PRNGKey(0), cfg, tx, B, scan)

        return run, state, scan

    variants = {
        "full": variant(),
        "no_place": variant(render_kw=dict(
            occupancy=False, occ_guided=False, compact_samples=0,
            occ_probes=0, num_samples=K)),
        "probes32": variant(render_kw=dict(occ_probes=32)),
        "k24": variant(render_kw=dict(compact_samples=24)),
        "tiny_mlp": variant(mlp_kw=dict(width=16)),
        "short_ladder": variant(hash_kw=dict(num_levels=5)),
        "sgd": variant(opt="sgd"),
        "scan16": variant(scan=16),
    }

    warm = {}
    for name, (run, state, scan) in variants.items():
        print(f"compiling {name} ...", flush=True)
        for attempt in range(3):
            try:
                for _ in range(2):
                    state, m = run(state)
                float(m["loss"])
                warm[name] = (run, state, scan)
                break
            except Exception as e:
                print(f"  {name} attempt {attempt} failed: {e!r}"[:300],
                      flush=True)
                time.sleep(180)
        else:
            results[name] = dict(error="failed after retries")

    rates = {name: [] for name in warm}
    for rnd_i in range(3):
        for name, (run, state, scan) in warm.items():
            iters = max(1, 24 // scan)
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = run(state)
                float(m["loss"])
            dt = (time.perf_counter() - t0) / iters
            warm[name] = (run, state, scan)
            rates[name].append(B * scan / dt)
        print(f"round {rnd_i}: " + " | ".join(
            f"{n} {rates[n][-1]/1e3:.1f}k" for n in warm), flush=True)

    full_ms = None
    for name in warm:
        scan = warm[name][2]
        best = max(rates[name])
        ms = B * scan / best / scan * 1e3  # ms per step
        results[name] = dict(rays_per_s=round(best, 1),
                             ms_per_step=round(ms, 2),
                             all=[round(r, 1) for r in rates[name]])
        if name == "full":
            full_ms = ms
    if full_ms is not None:
        for name in warm:
            if name != "full":
                results[name]["diff_ms_vs_full"] = round(
                    full_ms - results[name]["ms_per_step"], 2)

    payload = json.dumps(results, indent=1)
    print(payload, flush=True)
    with open("step_ablate_r4.json", "w") as f:
        f.write(payload)


if __name__ == "__main__":
    main()
