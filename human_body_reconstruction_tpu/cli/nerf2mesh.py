"""Mesh-export CLI — flag-compatible with reference nerf2mesh.py:15-26.

Reference flags accepted verbatim: --use_sdf --hierarchical --max_res
--hash_size --model_name --bound_pth --ckpt_name --near --far.
Extensions: --iso (reference hard-codes 30.0, nerf2mesh.py:98),
--resolution (reference hard-codes 256, :27), --out (the reference never
writes a file), --color_mode {rgb,xyz}, --cache, --view, --ckpt_dir.

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
    p.add_argument("--normalization", type=str, default="diagonal",
                   choices=["diagonal", "unit_box"],
                   help="must match the trainer's --normalization")
    p.add_argument("--chunk", type=int, default=262144)
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

    cfg = C.PipelineConfig(
        hash=C.HashConfig(n_max=int(args.max_res),
                          log2_table_size=int(args.hash_size)),
        mlp=C.MLPConfig(
            density_activation="sdf" if args.use_sdf else "leaky_relu"),
        render=C.RenderConfig(near=args.near, far=args.far,
                              use_sdf=args.use_sdf,
                              hierarchical=args.hierarchical),
    )

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
        color_mode=args.color_mode)
    print(f"wrote {stats['out_path']}: {stats['num_verts']} verts, "
          f"{stats['num_faces']} faces")


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
                f"checkpoint incompatible: {got.shape} vs {np.shape(want)}")
    return jax.tree_util.tree_unflatten(treedef, new), {}


if __name__ == "__main__":
    main()
