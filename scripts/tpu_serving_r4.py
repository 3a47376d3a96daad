"""Serving steady-state, round 4 (VERDICT r3 item 9).

Same protocol as tpu_serving_r3.py but on the FINAL flagship preset
(cp rank-21 + TV 1e-2 warmup + stratified guided placement) and adding
the round-4 batch/orbit endpoint: `render_poses_fused` renders P poses
in ONE dispatch, amortising the ~35 ms tunnel floor per frame.

  fused_bf16        single-frame fused render, bf16 field (r3 champion)
  fused_bf16_g64    + deterministic 64-sample guided eval placement
  batch8_bf16       8-pose orbit in one dispatch, per-frame numbers
  batch8_bf16_g64   + guided eval

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_serving_r4.py
"""

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import sys
    sys.path.insert(0, "scripts")
    from quality_matrix import load_or_render_gt

    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.ops import dense_grid
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import occupancy
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    print("devices:", jax.devices(), flush=True)
    H = W = 400
    K, train_poses, hold_poses, train_imgs, hold_imgs = load_or_render_gt(
        H, W, 20, scene="textured")
    train_imgs = jnp.asarray(train_imgs)
    train_poses = jnp.asarray(train_poses)
    lo, hi = rays_lib.scene_bounds(H, W, K, train_poses, 2.0, 6.0)
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}

    # the shipped flagship preset (cli/train_hash.py resolve_preset)
    hcfg = C.HashConfig(num_levels=8, n_min=16, n_max=2048, variant="cp",
                        cp_rank=21)
    hcfg = dataclasses.replace(
        hcfg, dense_levels=dense_grid.auto_dense_levels(hcfg))
    cfg = C.PipelineConfig(
        hash=hcfg,
        render=C.RenderConfig(num_samples=128, occupancy=True,
                              occupancy_resolution=128, compact_samples=32,
                              occ_guided=True, occ_probes=64,
                              occ_dt="mass", occ_stratified=True),
        train=C.TrainConfig(ray_batch=16384, sigma_l1_weight=1e-4,
                            cp_tv_weight=1e-2, cp_tv_warmup=320))

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {**he.init_encoder(k1, cfg.hash),
              "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                        cfg.dir_enc.out_dim)}
    state, tx = state_lib.create_train_state(params, cfg.train, 2000,
                                             occ=None)
    occ_pending = occupancy.init_grid(128, threshold=0.01)

    def run(state):
        return step_lib.train_step(state, scene, train_imgs, train_poses,
                                   K, jax.random.PRNGKey(1), cfg, tx, 16384)

    t0 = time.time()
    for s in range(1, 1501):
        if s == 257:
            state = state._replace(occ=occ_pending)
            state = state._replace(occ=occupancy.update_from_field(
                state.occ, state.params, scene, jax.random.PRNGKey(s), cfg,
                num_cells=2 ** 21))
        state, m = run(state)
        if state.occ is not None and s % 64 == 0:
            state = state._replace(occ=occupancy.update_from_field(
                state.occ, state.params, scene, jax.random.PRNGKey(s), cfg,
                num_cells=2 ** 21))
        if s % 250 == 0:
            print(f"step {s} train_psnr {float(m['psnr']):.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    occ = state.occ
    print(f"trained 1500 steps in {time.time()-t0:.0f}s; occ_frac "
          f"{float(occupancy.occupied_fraction(occ)):.3f}", flush=True)

    pose = jnp.asarray(hold_poses[0])
    gt = hold_imgs[0]
    # 8-pose orbit through the holdout pose's radius/elevation
    from human_body_reconstruction_tpu.data import synthetic
    orbit = jnp.stack([jnp.asarray(synthetic.look_at_pose(
        (4.0 * np.cos(t), 4.0 * np.sin(t), 4.0 * 0.35)))
        for t in np.linspace(0.0, 2.0 * np.pi, 8, endpoint=False)])
    results = {}

    eval_cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, eval_guided=0))
    g64_cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, eval_guided=64,
                                        occ_probes=128))

    def time_single(name, rcfg, ref=None):
        fn = lambda: step_lib.render_image_fused(
            state.params, scene, H, W, K, pose, rcfg, occ=occ,
            num_samples=128, chunk=16384, bf16=True)
        img = np.asarray(fn())
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            img = np.asarray(fn())
        dt = (time.perf_counter() - t0) / n
        psnr = 10 * np.log10(1.0 / max(float(np.mean((img - gt) ** 2)),
                                       1e-12))
        row = {"s_per_frame": round(dt, 3),
               "rays_per_s": round(H * W / dt, 1),
               "psnr_vs_gt": round(psnr, 2)}
        if ref is not None:
            row["delta_db_vs_ref"] = round(psnr - ref, 3)
        results[name] = row
        print(name, row, flush=True)
        return psnr

    def time_batch(name, rcfg):
        fn = lambda: step_lib.render_poses_fused(
            state.params, scene, H, W, K, orbit, rcfg, occ=occ,
            num_samples=128, chunk=16384, bf16=True)
        imgs = np.asarray(fn())
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            imgs = np.asarray(fn())
        dt = (time.perf_counter() - t0) / n
        row = {"s_per_frame": round(dt / len(orbit), 3),
               "s_per_batch": round(dt, 3),
               "rays_per_s": round(len(orbit) * H * W / dt, 1),
               "finite": bool(np.isfinite(imgs).all())}
        results[name] = row
        print(name, row, flush=True)

    ref = time_single("fused_bf16", eval_cfg)
    time_single("fused_bf16_g64", g64_cfg, ref)
    time_batch("batch8_bf16", eval_cfg)
    time_batch("batch8_bf16_g64", g64_cfg)

    payload = json.dumps(results, indent=1)
    print(payload, flush=True)
    with open(os.environ.get("SERVING_OUT", "serving_r4.json"), "w") as f:
        f.write(payload)


if __name__ == "__main__":
    main()
