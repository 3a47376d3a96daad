"""One-command video -> mesh reconstruction pipeline.

Chains the four stages a user of the reference repo runs by hand
(README workflow: colmap2nerf.py -> Segment.py -> train_hash2.py ->
nerf2mesh.py):

  1. frames + poses: ffmpeg + COLMAP -> transforms.json,
  2. segmentation: mask the subject in every frame,
  3. training: hash-NeRF on the masked frames,
  4. export: density sweep + marching cubes -> .ply.

Run:  python -m human_body_reconstruction_tpu.cli.reconstruct \
          --video_in capture.mp4 --workdir run1 --steps 30000

Stages can be skipped (--skip_poses --skip_segment ...) to resume a
partially-finished reconstruction.
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="video -> mesh reconstruction")
    p.add_argument("--video_in", type=str, default="")
    p.add_argument("--images", type=str, default=None,
                   help="existing frame directory (skips ffmpeg)")
    p.add_argument("--workdir", type=str, default="reconstruction")
    p.add_argument("--video_fps", type=float, default=2.0)
    p.add_argument("--colmap_matcher", type=str, default="sequential")
    p.add_argument("--segment_backend", type=str, default="grabcut",
                   choices=["grabcut", "threshold", "deeplab", "sam",
                            "none"])
    p.add_argument("--steps", type=int, default=30000)
    p.add_argument("--num_batch", type=int, default=16000)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--near", type=float, default=2.0)
    p.add_argument("--far", type=float, default=6.0)
    p.add_argument("--stochastic", action="store_true")
    p.add_argument("--packed", action="store_true")
    p.add_argument("--occupancy", action="store_true")
    p.add_argument("--normalization", type=str, default="diagonal",
                   choices=["diagonal", "unit_box"])
    p.add_argument("--iso", type=float, default=30.0)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--skip_poses", action="store_true")
    p.add_argument("--skip_segment", action="store_true")
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_mesh", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)
    images_dir = args.images or os.path.join(args.workdir, "images")
    transforms = os.path.join(args.workdir, "transforms.json")

    # 1. poses ------------------------------------------------------------
    if not args.skip_poses:
        from human_body_reconstruction_tpu.pipeline import capture

        if args.video_in:
            capture.run_ffmpeg(args.video_in, images_dir,
                               fps=args.video_fps)
        text = capture.run_colmap(
            images_dir, db=os.path.join(args.workdir, "colmap.db"),
            matcher=args.colmap_matcher)
        out = capture.build_transforms(text, images_dir,
                                       json_dir=args.workdir)
        capture.write_transforms(out, transforms)
        print(f"[poses] {len(out['frames'])} registered -> {transforms}")

    # 2. segmentation -----------------------------------------------------
    if not args.skip_segment and args.segment_backend != "none":
        import json

        from human_body_reconstruction_tpu.pipeline import segment

        seg_dir = os.path.join(args.workdir, "SegmentedImages")
        written = segment.segment_images(
            os.path.join(images_dir, "*"), seg_dir,
            backend=args.segment_backend)
        # retarget transforms at the masked frames; file_path is resolved
        # relative to the json's own directory by the dataset reader
        with open(transforms) as f:
            meta = json.load(f)
        masked_dir = os.path.relpath(
            os.path.join(seg_dir, args.segment_backend.upper()),
            start=args.workdir)
        for fr in meta["frames"]:
            fr["file_path"] = os.path.join(
                f"./{masked_dir}", os.path.basename(fr["file_path"]))
        transforms_masked = os.path.join(args.workdir,
                                         "transforms_masked.json")
        with open(transforms_masked, "w") as f:
            json.dump(meta, f, indent=2)
        transforms = transforms_masked
        print(f"[segment] {len(written)} masked frames")

    # 3. training ---------------------------------------------------------
    results = os.path.join(args.workdir, "results")
    if not args.skip_train:
        import shutil

        from human_body_reconstruction_tpu.cli import train_hash

        # the trainer reads <data_path>/transforms_train.json
        data_dir = os.path.dirname(transforms) or "."
        train_json = os.path.join(data_dir, "transforms_train.json")
        if os.path.abspath(train_json) != os.path.abspath(transforms):
            shutil.copyfile(transforms, train_json)
        argv_train = ["--data_path", data_dir, "--steps", str(args.steps),
                      "--num_batch", str(args.num_batch),
                      "--num_samples", str(args.num_samples),
                      "--near", str(args.near), "--far", str(args.far),
                      "--out_dir", results, "--model_name", "recon",
                      "--normalization", args.normalization, "--write"]
        for flag, on in (("--stochastic", args.stochastic),
                         ("--packed", args.packed),
                         ("--occupancy", args.occupancy)):
            if on:
                argv_train.append(flag)
        train_hash.main(argv_train)

    # 4. mesh -------------------------------------------------------------
    if not args.skip_mesh:
        from human_body_reconstruction_tpu.cli import nerf2mesh

        mesh_out = os.path.join(args.workdir, "mesh.ply")
        nerf2mesh.main([
            "--ckpt_dir", results, "--model_name", "recon",
            "--bound_pth", os.path.join(results, "bounds_model.npy"),
            "--near", str(args.near), "--far", str(args.far),
            "--iso", str(args.iso), "--resolution", str(args.resolution),
            "--normalization", args.normalization,
            "--cache", os.path.join(args.workdir, "density_grid_w_rgb.npy"),
            "--out", mesh_out])
        print(f"[mesh] {mesh_out}")


if __name__ == "__main__":
    main()
