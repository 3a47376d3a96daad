"""Wall-clock-to-30-dB speedrun on the hard textured scene.

BASELINE.md north-star: "<10 min wall-clock to >=30 PSNR (lego)" on one
v5e chip.  The lego dataset is unavailable offline, so this runs the
harder proxy protocol (synthetic.textured_field at 400x400, the
quality-matrix scene) at the flagship operating point (int8 + dense
coarse levels + occupancy-guided placement, K=32, 64 probes, unbiased
mass-dt) and reports the wall clock at which a HELD-OUT exact-ladder
eval render first reaches 30 dB.

Protocol notes:
  * the clock starts BEFORE the first train step and INCLUDES compile
    (reported both with and without, since the remote-compile tunnel
    adds minutes a local chip would not pay),
  * evals run every --eval_every steps once train PSNR > 27 (each eval
    costs ~2 training seconds; the eval clock is excluded from the
    "train-only" number but included in wall-clock),
  * the eval is a full 400x400 render with the exact interpolant at
    128 samples, no culling — no training-path estimator leaks in.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/speedrun_30db.py
"""

import argparse
import dataclasses
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from quality_matrix import load_or_render_gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target_db", type=float, default=30.0)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--height", type=int, default=400)
    ap.add_argument("--views", type=int, default=20)
    ap.add_argument("--max_steps", type=int, default=6000)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--eval_after_train_db", type=float, default=27.0)
    ap.add_argument("--out", type=str, default="speedrun_30db.json")
    ap.add_argument("--steps_per_call", type=int, default=1,
                    help="fuse N optimizer steps per dispatch "
                         "(train_step_multi); must divide eval_every")
    ap.add_argument("--aot_cache", type=str, default="",
                    help="disk-backed executable cache: a warm rerun "
                         "skips the minutes-long remote compiles "
                         "(utils/aot.py; the tunnel supports "
                         "serialization, PERF_NOTES)")
    ap.add_argument("--eval_guided", type=int, default=0,
                    help="gate holdout evals with the K-budget "
                         "deterministic guided render (2.5x cheaper at "
                         "K=48, -0.09 dB, PERF_NOTES 'Serving'); the "
                         "30-dB crossing is still declared ONLY on a "
                         "full exact-ladder confirmation render")
    ap.add_argument("--encoder", type=str, default="cp",
                    choices=["int8", "cp"],
                    help="int8: the hash flagship (int8 packed gathers + "
                         "dense coarse levels); cp: the all-MXU CP "
                         "factor-line encoder (ops/lowrank.py; +2.6-3.7 "
                         "dB at the 240s quality budget, qm_cp.json)")
    ap.add_argument("--cp_rank", type=int, default=32)
    args = ap.parse_args()
    if args.eval_every % args.steps_per_call:
        raise SystemExit("--steps_per_call must divide --eval_every")

    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.ops import dense_grid
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import occupancy
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    print("devices:", jax.devices(), flush=True)
    H = W = args.height
    K, train_poses, hold_poses, train_imgs, hold_imgs = load_or_render_gt(
        H, W, args.views)
    train_imgs = jnp.asarray(train_imgs)
    train_poses = jnp.asarray(train_poses)
    # the speedrun gates on the legacy interior holdout (comparable with
    # the round-2 numbers); the quality matrix carries the 4-pose set
    hold_img = hold_imgs[0]
    hold_pose = jnp.asarray(hold_poses[0])

    lo, hi = rays_lib.scene_bounds(H, W, K, train_poses, 2.0, 6.0)
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}

    if args.encoder == "cp":
        enc = C.HashConfig(num_levels=8, n_min=16, n_max=2048,
                           variant="cp", cp_rank=args.cp_rank)
    else:
        enc = C.HashConfig(num_levels=8, features_per_level=4, n_min=16,
                           n_max=2048, log2_table_size=16,
                           stochastic_train=True, packed=True,
                           pack_format="int8", grad_subsample=True,
                           hw_rng=True)
    enc = dataclasses.replace(
        enc, dense_levels=dense_grid.auto_dense_levels(enc))
    cfg = C.PipelineConfig(
        hash=enc,
        render=C.RenderConfig(num_samples=128, occupancy=True,
                              occupancy_resolution=128,
                              compact_samples=32, occ_guided=True,
                              occ_probes=64, occ_dt="mass"),
        train=C.TrainConfig(ray_batch=args.batch,
                            cp_tv_weight=(1e-2 if args.encoder == "cp"
                                          else 0.0)))
    eval_cfg = dataclasses.replace(
        cfg, hash=dataclasses.replace(cfg.hash, stochastic_train=False),
        render=dataclasses.replace(cfg.render, occupancy=False,
                                   compact_samples=0, occ_guided=False))
    # cheap gating render: deterministic guided placement at K samples
    # on the trained occupancy CDF (probes=128 per the serving A/B)
    guided_cfg = dataclasses.replace(
        eval_cfg, render=dataclasses.replace(
            eval_cfg.render, eval_guided=args.eval_guided, occ_probes=128))

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {**he.init_encoder(k1, cfg.hash),
              "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                        cfg.dir_enc.out_dim)}
    state, tx = state_lib.create_train_state(params, cfg.train,
                                             args.max_steps)
    warmup = cfg.train.occ_warmup_steps
    occ_pending = occupancy.init_grid(cfg.render.occupancy_resolution,
                                      threshold=cfg.render.occ_threshold)

    step_fn = step_lib.train_step
    multi_fn = step_lib.train_step_multi
    render_fn = None
    if args.aot_cache:
        from human_body_reconstruction_tpu.utils import aot

        cache = aot.AOTCache(args.aot_cache)
        step_fn = aot.CachedJit(step_lib.train_step, cache,
                                static_argnames=("cfg", "tx", "batch_size"))
        multi_fn = aot.CachedJit(step_lib.train_step_multi, cache,
                                 static_argnames=("cfg", "tx", "batch_size",
                                                  "n_steps"))
        render_fn = aot.CachedJit(step_lib.render_chunk, cache,
                                  static_argnames=("cfg", "num_samples",
                                                   "hierarchical"))
        print(f"aot executable cache at {cache.dir}", flush=True)
    spc = max(1, args.steps_per_call)

    def run(state):
        if spc > 1:
            return multi_fn(state, scene, train_imgs, train_poses, K,
                            jax.random.PRNGKey(1), cfg=cfg, tx=tx,
                            batch_size=args.batch, n_steps=spc)
        return step_fn(state, scene, train_imgs, train_poses, K,
                       jax.random.PRNGKey(1), cfg=cfg, tx=tx,
                       batch_size=args.batch)

    def occ_refresh(state, steps):
        # jitted one-dispatch refresh (an eager update pays ~35 ms of
        # tunnel latency PER OP — seconds per refresh)
        new_occ = occupancy.update_from_field(
            state.occ, state.params, scene, jax.random.PRNGKey(steps),
            cfg, num_cells=max(2 ** 20, state.occ.density.size // 8))
        return state._replace(occ=new_occ)

    def holdout_db(state, guided: bool = False):
        use_g = guided and args.eval_guided > 0 and state.occ is not None
        img = step_lib.render_image(state.params, scene, H, W, K,
                                    hold_pose,
                                    guided_cfg if use_g else eval_cfg,
                                    occ=state.occ if use_g else None,
                                    num_samples=128,
                                    chunk=32768, render_fn=render_fn)
        mse = float(np.mean((img - hold_img) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    t_wall0 = time.perf_counter()
    state, m = run(state)                        # includes compile
    float(m["loss"])
    t_compiled = time.perf_counter()
    # Three more fresh HLOs land later and must not pollute the
    # "excl_compile" numbers (each is minutes through the remote
    # tunnel): the culled step after the occupancy grid installs (the
    # state pytree changes), the occupancy refresh itself, and the
    # first holdout eval's render.  Track their excess over a warm
    # invocation explicitly.
    compile_extra = 0.0
    eval_time = 0.0
    steps = spc
    crossed = None
    eval_count = 0
    while steps < args.max_steps:
        if occ_pending is not None and steps >= warmup:
            tc = time.perf_counter()
            state = occ_refresh(state._replace(occ=occ_pending), steps)
            occ_pending = None
            state, m = run(state)                # fresh HLO (occ in tree)
            float(m["loss"])
            steps += spc
            compile_extra += time.perf_counter() - tc
            continue
        state, m = run(state)
        steps += spc
        if state.occ is not None and steps // 64 > (steps - spc) // 64:
            state = occ_refresh(state, steps)
        if steps % args.eval_every == 0:
            te = time.perf_counter()
            train_db = float(m["psnr"])          # syncs the queue too
            if train_db < args.eval_after_train_db:
                print(f"step {steps}: train {train_db:.2f} dB "
                      f"(eval skipped)", flush=True)
                continue
            use_g = args.eval_guided > 0 and state.occ is not None
            db = holdout_db(state, guided=use_g)
            exact_db = None
            if use_g and db >= args.target_db - 0.25:
                # guided reads ~0.1 dB low (serving A/B); crossing is
                # declared only on the exact-ladder confirmation
                exact_db = holdout_db(state)
            dte = time.perf_counter() - te
            eval_count += 1
            if eval_count == 1:
                first_eval_s = dte               # includes render compile
            eval_time += dte
            now = time.perf_counter()
            tag = f"guided{args.eval_guided}" if use_g else "holdout"
            msg = (f"step {steps}: train {train_db:.2f} dB, {tag} "
                   f"{db:.2f} dB")
            if exact_db is not None:
                msg += f", exact {exact_db:.2f} dB"
            print(msg + f" at wall {now - t_wall0:.0f}s", flush=True)
            final_db = exact_db if use_g else db
            if final_db is not None and final_db >= args.target_db:
                crossed = {
                    "steps": steps,
                    "holdout_db": round(final_db, 2),
                    "gate": tag,
                    "wall_s_incl_compile": round(now - t_wall0, 1),
                    "wall_s_excl_compile": round(
                        now - t_compiled - compile_extra, 1),
                    "train_s_excl_evals": round(
                        now - t_compiled - compile_extra - eval_time, 1),
                    "compile_s": {
                        "first_step": round(t_compiled - t_wall0, 1),
                        "occ_install": round(compile_extra, 1),
                        "first_eval": round(first_eval_s, 1),
                    },
                }
                break
    enc_tag = (f"cp_r{args.cp_rank}" if args.encoder == "cp"
               else "int8") + "+dense"
    result = {"target_db": args.target_db, "crossed": crossed,
              "protocol": f"textured {H}x{W}, {args.views} views, "
                          f"batch {args.batch}, {enc_tag}+"
                          f"guided K=32 mass-dt"
                          + (f", {spc} steps/dispatch" if spc > 1 else "")
                          + (", warm aot cache" if args.aot_cache else "")
                          + (f", guided{args.eval_guided}-gated evals "
                             f"(exact-confirmed crossing)"
                             if args.eval_guided else "")}
    print(json.dumps(result), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
