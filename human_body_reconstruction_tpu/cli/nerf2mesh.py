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
import dataclasses
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
    p.add_argument("--normalization", type=str, default="diagonal",
                   choices=["diagonal", "unit_box"],
                   help="must match the trainer's --normalization")
    p.add_argument("--chunk", type=int, default=262144)
    p.add_argument("--aot_cache", type=str, default="",
                   help="directory for the disk-backed compiled-executable "
                        "cache: repeat exports at the same "
                        "config/resolution skip the sweep's remote compile")
    p.add_argument("--encoder_variant", type=str, default=None,
                   choices=["corner", "cell"],
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

    import jax
    import jax.numpy as jnp
    import numpy as np

    from human_body_reconstruction_tpu.pipeline import mesh_export
    from human_body_reconstruction_tpu.train import checkpoint as ckpt_lib
    from human_body_reconstruction_tpu.train import trainer as trainer_lib
    from human_body_reconstruction_tpu.utils import config as C

    # Prefer the persisted training config (written by Trainer.save next
    # to the checkpoint): it pins encoder variant / activations / table
    # geometry exactly, so exports can't silently mismatch the weights.
    cfg_json = os.path.join(args.ckpt_dir, f"{args.model_name}_config.json")
    if os.path.exists(cfg_json):
        saved = C.from_json(cfg_json)
        cfg = C.PipelineConfig(
            hash=saved.hash, dir_enc=saved.dir_enc, mlp=saved.mlp,
            render=dataclasses.replace(
                saved.render, near=args.near, far=args.far,
                hierarchical=args.hierarchical),
            train=saved.train)
        print(f"restored model config from {cfg_json}")
    else:
        cfg = C.PipelineConfig(
            hash=C.HashConfig(n_max=int(args.max_res),
                              log2_table_size=int(args.hash_size),
                              variant=args.encoder_variant or "corner"),
            mlp=C.MLPConfig(
                density_activation="sdf" if args.use_sdf else "leaky_relu",
                rgb_activation="elu" if args.rgb_elu else "sigmoid"),
            render=C.RenderConfig(near=args.near, far=args.far,
                                  use_sdf=args.use_sdf,
                                  hierarchical=args.hierarchical),
        )
    if args.encoder_variant and args.encoder_variant != cfg.hash.variant:
        cfg = dataclasses.replace(
            cfg, hash=dataclasses.replace(cfg.hash,
                                          variant=args.encoder_variant))

    bound_path = args.bound_pth
    if not os.path.exists(bound_path):
        bound_path = os.path.join(args.ckpt_dir, os.path.basename(bound_path))
    lo, hi = ckpt_lib.load_bounds(bound_path)
    lo_j, hi_j = jnp.asarray(lo), jnp.asarray(hi)
    if args.normalization == "unit_box":
        sigma = jnp.maximum(hi_j - lo_j, 1e-6)
    else:
        sigma = jnp.sqrt(jnp.sum((hi_j - lo_j) ** 2))
    scene = {"mu": lo_j, "sigma": sigma,
             "min_bound": lo_j, "max_bound": hi_j}

    params = trainer_lib.init_params(jax.random.PRNGKey(0), cfg)
    # Accept either the trainer's "{model_name}_ckpt.npz" or the
    # reference-style "{ckpt_name}" prefix.
    candidates = [
        os.path.join(args.ckpt_dir, f"{args.model_name}_ckpt.npz"),
        os.path.join(args.ckpt_dir, f"{args.ckpt_name}_ckpt.npz"),
        f"{args.model_name}_ckpt.npz",
    ]
    ckpt = next((c for c in candidates if os.path.exists(c)), None)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint found in {candidates}")
    params, _ = _load_params(ckpt, params)
    print(f"loaded {ckpt}")

    stats = mesh_export.export_mesh(
        params, scene, cfg, resolution=args.resolution, iso=args.iso,
        chunk=args.chunk, cache_path=args.cache or None, out_path=args.out,
        color_mode=args.color_mode,
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


def _load_params(ckpt_path, params_template):
    """Load only the params subtree from a full train-state checkpoint,
    or a bare params checkpoint."""
    import numpy as np
    import jax

    from human_body_reconstruction_tpu.train import checkpoint as ckpt_lib

    try:
        return ckpt_lib.load_pytree(ckpt_path, params_template)
    except (ValueError, KeyError):
        pass
    # full train-state layout: (params, opt_state); leaves of params come
    # first in tree_flatten order, so load positionally.
    leaves, treedef = jax.tree_util.tree_flatten(params_template)
    with np.load(ckpt_path) as data:
        new = [data[f"leaf_{i}"] for i in range(len(leaves))]
    for got, want in zip(new, leaves):
        if tuple(got.shape) != tuple(np.shape(want)):
            raise ValueError(
                f"checkpoint leaf shape {got.shape} does not match the "
                f"rebuilt model's {np.shape(want)} — the export config "
                "(encoder variant / table size / activations) differs from "
                "training. Pass --encoder_variant/--rgb_elu/--hash_size to "
                "match, or export from a run directory containing "
                "<model_name>_config.json (written by the trainer).")
    return jax.tree_util.tree_unflatten(treedef, new), {}


if __name__ == "__main__":
    main()
