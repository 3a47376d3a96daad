"""Mesh-export CLI — flag-compatible with reference nerf2mesh.py:15-26.

Reference flags accepted verbatim: --use_sdf --hierarchical --max_res
--hash_size --model_name --bound_pth --ckpt_name --near --far.
Extensions: --iso (reference hard-codes 30.0, nerf2mesh.py:98),
--resolution (reference hard-codes 256, :27), --out (the reference never
writes a file), --color_mode {rgb,xyz}, --cache, --ckpt_dir,
--encoder_variant/--rgb_elu (must match training; auto-restored from the
trainer's <model_name>_config.json when present), --view (open the mesh
in an open3d window like the reference's display-only viewer,
nerf2mesh.py:102-107; requires open3d + a display).

Run:  python -m human_body_reconstruction_tpu.cli.nerf2mesh \
          --ckpt_dir results --model_name default --out mesh.ply
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="NeRF -> mesh (TPU-native)")
    # reference surface
    p.add_argument("--use_sdf", action="store_true")
    p.add_argument("--hierarchical", action="store_true")
    p.add_argument("--max_res", type=float, default=2048)
    p.add_argument("--hash_size", type=float, default=16)
    p.add_argument("--model_name", type=str, default="default")
    p.add_argument("--bound_pth", type=str, default="bounds.npy")
    p.add_argument("--ckpt_name", type=str, default="N_2048_T_16")
    p.add_argument("--near", type=float, default=2.0)
    p.add_argument("--far", type=float, default=6.0)
    # extensions
    p.add_argument("--iso", type=float, default=30.0)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--out", type=str, default="mesh.ply")
    p.add_argument("--color_mode", type=str, default="rgb",
                   choices=["rgb", "xyz"])
    p.add_argument("--cache", type=str, default="density_grid_w_rgb.npy",
                   help="density grid cache path ('' disables)")
    p.add_argument("--ckpt_dir", type=str, default="results")
    p.add_argument("--normalization", type=str, default=None,
                   choices=["diagonal", "unit_box"],
                   help="must match the trainer's --normalization "
                        "(auto-restored from <model_name>_config.json "
                        "when present; 'diagonal' otherwise)")
    p.add_argument("--chunk", type=int, default=262144)
    p.add_argument("--aot_cache", type=str, default="",
                   help="directory for the disk-backed compiled-executable "
                        "cache: repeat exports at the same "
                        "config/resolution skip the sweep's remote compile")
    p.add_argument("--encoder_variant", type=str, default=None,
                   choices=["corner", "cell", "cp"],
                   help="hash layout used at training time (auto-restored "
                        "from <model_name>_config.json when present)")
    p.add_argument("--rgb_elu", action="store_true",
                   help="checkpoint was trained with --rgb_elu")
    p.add_argument("--view", action="store_true",
                   help="open the mesh in an open3d viewer (reference "
                        "nerf2mesh.py:102-107); needs open3d + a display")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from human_body_reconstruction_tpu.pipeline import mesh_export, restore

    # Shared restoration path (pipeline/restore.py): persisted training
    # config preferred, flag reconstruction as fallback — exports can't
    # silently mismatch the weights.
    res = restore.restore(
        args.ckpt_dir, args.model_name, bound_pth=args.bound_pth,
        ckpt_name=args.ckpt_name, near=args.near, far=args.far,
        hierarchical=args.hierarchical, use_sdf=args.use_sdf,
        max_res=args.max_res, hash_size=args.hash_size,
        encoder_variant=args.encoder_variant, rgb_elu=args.rgb_elu,
        normalization=args.normalization)

    stats = mesh_export.export_mesh(
        res.params, res.scene, res.cfg, resolution=args.resolution,
        iso=args.iso, chunk=args.chunk, cache_path=args.cache or None,
        out_path=args.out, color_mode=args.color_mode,
        aot_cache=args.aot_cache or os.environ.get("HBR_AOT_CACHE"))
    print(f"wrote {stats['out_path']}: {stats['num_verts']} verts, "
          f"{stats['num_faces']} faces")
    if args.view:
        try:
            mesh_export.view_mesh(stats["verts"], stats["faces"],
                                  stats["colors"])
        except ImportError:
            print("--view requested but open3d is not installed; "
                  f"open {stats['out_path']} in any mesh viewer instead")


if __name__ == "__main__":
    main()
