"""Novel-view rendering from a trained checkpoint — the serving path.

The reference has no standalone renderer: novel views only fall out of
the training script's periodic test renders (train_hash2.py:271-298) or
the live --display window (:247-268).  This CLI is the missing
inference surface: load a run directory (checkpoint + persisted config
+ bounds), render any camera set, write PNGs and a metrics JSON.

Camera sources (exactly one):
  --data_path transforms.json   render every frame of a dataset (PSNR
                                vs the GT images is reported per view)
  --orbit N                     N synthesized poses on a circle around
                                the scene (radius/elevation flags)
  --poses file.npy              (M, 4, 4) c2w stack, intrinsics from
                                --height/--width/--camera_angle_x

The trained occupancy grid persisted inside the checkpoint is reused
for culling with --use_occ (same accelerated sampling as training).
--aot_cache reuses compiled render executables across processes — on
the remote-TPU tunnel a fresh compile costs minutes, so repeat serving
runs at a fixed (H, W, chunk, samples) shape skip it entirely.

Run:  python -m human_body_reconstruction_tpu.cli.render \
          --ckpt_dir results --model_name default --orbit 12 \
          --out_dir renders
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser():
    p = argparse.ArgumentParser(
        description="Render novel views from a checkpoint (TPU-native)")
    # run directory / model identity (shared with cli/nerf2mesh.py)
    p.add_argument("--ckpt_dir", type=str, default="results")
    p.add_argument("--model_name", type=str, default="default")
    p.add_argument("--bound_pth", type=str, default="bounds_model.npy")
    p.add_argument("--ckpt_name", type=str, default="N_2048_T_16")
    p.add_argument("--use_sdf", action="store_true")
    p.add_argument("--max_res", type=float, default=2048)
    p.add_argument("--hash_size", type=float, default=16)
    p.add_argument("--encoder_variant", type=str, default=None,
                   choices=["corner", "cell", "cp"])
    p.add_argument("--rgb_elu", action="store_true")
    p.add_argument("--normalization", type=str, default=None,
                   choices=["diagonal", "unit_box"],
                   help="override the saved config's normalization")
    # render-time choices
    p.add_argument("--near", type=float, default=2.0)
    p.add_argument("--far", type=float, default=6.0)
    p.add_argument("--num_samples", type=int, default=256)
    p.add_argument("--hierarchical", action="store_true")
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--fused", action="store_true",
                   help="whole-frame one-dispatch render "
                        "(render_image_fused): saves ~35 ms tunnel "
                        "latency per chunk; mutually exclusive with "
                        "--aot_cache")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 field compute during render (matches "
                        "the training step; quality measured per "
                        "checkpoint)")
    p.add_argument("--use_occ", action="store_true",
                   help="reuse the trained occupancy grid saved in the "
                        "checkpoint for empty-space culling")
    p.add_argument("--eval_guided", type=int, default=0,
                   help="render each ray with this many deterministic "
                        "occupancy-guided samples instead of the full "
                        "--num_samples ladder (requires --use_occ; "
                        "--num_samples becomes the probe count); cuts "
                        "serving latency ~3-4x at a small PSNR cost")
    p.add_argument("--aot_cache", type=str, default="",
                   help="disk-backed compiled-executable cache dir")
    # camera sources
    p.add_argument("--data_path", type=str, default=None,
                   help="transforms*.json: render its frames, report "
                        "PSNR vs the GT images")
    p.add_argument("--orbit", type=int, default=0,
                   help="render N synthesized orbit poses")
    p.add_argument("--poses", type=str, default=None,
                   help=".npy with an (M, 4, 4) c2w stack")
    p.add_argument("--radius", type=float, default=4.0)
    p.add_argument("--elevation", type=float, default=0.5)
    p.add_argument("--height", type=int, default=400)
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--camera_angle_x", type=float, default=0.6911112,
                   help="horizontal FoV for orbit/poses intrinsics "
                        "(default = blender-synthetic lego)")
    p.add_argument("--white_background", action="store_true")
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--max_views", type=int, default=None,
                   help="cap the number of rendered views")
    p.add_argument("--stride", type=int, default=1,
                   help="render every k-th view of the camera set")
    # output
    p.add_argument("--out_dir", type=str, default="renders")
    p.add_argument("--tag", type=str, default=None,
                   help="output filename prefix (default: model_name)")
    p.add_argument("--gif", action="store_true",
                   help="also write an animated turntable GIF of the "
                        "rendered views (no ffmpeg needed)")
    p.add_argument("--gif_fps", type=float, default=8.0)
    return p


def _cameras_from_args(args):
    """Resolve the camera set: (c2ws (M,4,4), K, H, W, gt | None)."""
    import numpy as np

    sources = [args.data_path is not None, args.orbit > 0,
               args.poses is not None]
    if sum(sources) != 1:
        raise SystemExit("pass exactly one of --data_path / --orbit N / "
                         "--poses")
    if args.data_path:
        from human_body_reconstruction_tpu.data import datasets

        ds = datasets.load_nerf_json(args.data_path,
                                     white_background=args.white_background,
                                     downscale=args.downscale)
        return (ds["c2ws"], ds["K"], ds["H"], ds["W"], ds["images"])
    H, W = args.height, args.width
    focal = W / (2.0 * np.tan(args.camera_angle_x / 2.0))
    K = np.array([[focal, 0, W / 2.0], [0, focal, H / 2.0], [0, 0, 1]],
                 np.float32)
    if args.orbit:
        from human_body_reconstruction_tpu.data import synthetic

        c2ws = synthetic.orbit_poses(args.orbit, radius=args.radius,
                                     elevation=args.elevation)
    else:
        c2ws = np.load(args.poses).astype(np.float32)
        if c2ws.ndim == 2:
            c2ws = c2ws[None]
        if c2ws.shape[-2:] != (4, 4):
            raise SystemExit(f"--poses must hold (M, 4, 4) c2w matrices, "
                             f"got {c2ws.shape}")
    return (c2ws, K, H, W, None)


def main(argv=None):
    args = build_parser().parse_args(argv)

    cache_dir = args.aot_cache or os.environ.get("HBR_AOT_CACHE")
    if cache_dir and args.fused:
        # The AOT cache stores the chunked render_chunk executable; the
        # fused whole-frame path can't reuse it, so combining the two
        # would silently fall back to per-chunk dispatch (ADVICE r3).
        raise SystemExit(
            "--fused and --aot_cache are mutually exclusive: the AOT "
            "cache serves the chunked render path. Drop one (or unset "
            "HBR_AOT_CACHE).")

    import jax
    import numpy as np
    from PIL import Image

    from human_body_reconstruction_tpu.pipeline import restore
    from human_body_reconstruction_tpu.train import step as step_lib

    # resolve cameras first: a bad camera spec should fail before the
    # (potentially slow) checkpoint restore
    c2ws, K, H, W, gt = _cameras_from_args(args)

    res = restore.restore(
        args.ckpt_dir, args.model_name, bound_pth=args.bound_pth,
        ckpt_name=args.ckpt_name, near=args.near, far=args.far,
        hierarchical=args.hierarchical, use_sdf=args.use_sdf,
        max_res=args.max_res, hash_size=args.hash_size,
        encoder_variant=args.encoder_variant, rgb_elu=args.rgb_elu,
        normalization=args.normalization, with_occ=args.use_occ)
    occ = res.occ
    if args.use_occ and occ is None:
        print("--use_occ: checkpoint carries no occupancy grid; "
              "rendering unculled")
    cfg = res.cfg
    if args.eval_guided > 0:
        if occ is None:
            raise SystemExit("--eval_guided needs the trained occupancy "
                             "grid: pass --use_occ (and train with "
                             "occupancy enabled)")
        import dataclasses

        cfg = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render,
                                            eval_guided=args.eval_guided))

    idx = list(range(0, len(c2ws), max(1, args.stride)))
    if args.max_views is not None:
        idx = idx[:args.max_views]

    render_fn = None
    if cache_dir:
        from human_body_reconstruction_tpu.utils import aot

        render_fn = aot.CachedJit(
            step_lib.render_chunk, aot.AOTCache(cache_dir),
            static_argnames=("cfg", "num_samples", "hierarchical"))
        print(f"aot executable cache at {cache_dir}")

    os.makedirs(args.out_dir, exist_ok=True)
    tag = args.tag or args.model_name
    K_j = jax.numpy.asarray(np.asarray(K, np.float32))
    views, psnrs, frames = [], [], []
    t0 = time.perf_counter()
    for n_done, i in enumerate(idx):
        if args.fused and render_fn is None:
            img = np.asarray(step_lib.render_image_fused(
                res.params, res.scene, H, W, K_j,
                jax.numpy.asarray(c2ws[i]), cfg, occ=occ,
                num_samples=args.num_samples,
                hierarchical=args.hierarchical,
                chunk=min(args.chunk, H * W), bf16=args.bf16))
        else:
            img = step_lib.render_image(
                res.params, res.scene, H, W, K_j, jax.numpy.asarray(c2ws[i]),
                cfg, occ=occ, num_samples=args.num_samples,
                hierarchical=args.hierarchical, chunk=args.chunk,
                render_fn=render_fn)
        path = os.path.join(args.out_dir, f"{tag}_{i:04d}.png")
        frame = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(frame).save(path)
        if args.gif:
            frames.append(Image.fromarray(frame))
        rec = {"view": i, "path": path}
        if gt is not None:
            mse = float(np.mean((img - np.asarray(gt[i])) ** 2))
            rec["psnr"] = 10 * np.log10(1.0 / max(mse, 1e-12))
            psnrs.append(rec["psnr"])
            print(f"view {i:4d}: PSNR {rec['psnr']:.2f} dB -> {path}")
        else:
            print(f"view {i:4d} -> {path}")
        views.append(rec)
    wall = time.perf_counter() - t0

    summary = {
        "model_name": args.model_name,
        "num_views": len(views),
        "H": H, "W": W,
        "num_samples": args.num_samples,
        "eval_guided": args.eval_guided,
        "use_occ": bool(args.use_occ and occ is not None),
        "wall_s": round(wall, 2),
        "rays_per_sec": round(len(views) * H * W / max(wall, 1e-9), 1),
        "views": views,
    }
    if psnrs:
        summary["mean_psnr"] = float(np.mean(psnrs))
    if args.gif and frames:
        gif_path = os.path.join(args.out_dir, f"{tag}_turntable.gif")
        frames[0].save(gif_path, save_all=True, append_images=frames[1:],
                       duration=int(1000 / max(args.gif_fps, 0.1)), loop=0)
        summary["gif"] = gif_path
        print(f"wrote {gif_path}")
    if render_fn is not None:
        print(f"aot cache: {render_fn.cache.stats()}")
    out_json = os.path.join(args.out_dir, f"{tag}_render.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"{len(views)} views in {wall:.1f}s "
          f"({summary['rays_per_sec']/1e3:.1f}k rays/s)"
          + (f", mean PSNR {summary['mean_psnr']:.2f} dB" if psnrs else "")
          + f"; wrote {out_json}")
    return summary


if __name__ == "__main__":
    main()
