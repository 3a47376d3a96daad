"""Round-4 SDF->mesh export (VERDICT r3 missing #1, second half).

Loads the params saved by the qm_r4 SDF runs
(`qm_params_cp_r21_sdf_guided_k32_tv1e2_strat.npz`), rebuilds the SAME
mode cfg + scene bounds as scripts/quality_matrix.py, and exports the
zero level set of the 2sigma-1 pseudo-SDF (reference convention,
test_hash.py:60) with marching tetrahedra.  iso=0.0 — NOT the density
iso=30 of the NeRF export path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/tpu_sdf_mesh_r4.py [--scene textured] \
           [--mode cp_r21_sdf_guided_k32_tv1e2_strat] [--resolution 192]
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo/scripts")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="textured")
    ap.add_argument("--mode", default="cp_r21_sdf_guided_k32_tv1e2_strat")
    ap.add_argument("--params", default=None,
                    help="npz path (default qm_params_<mode>.npz)")
    ap.add_argument("--resolution", type=int, default=192)
    ap.add_argument("--iso", default="auto",
                    help="'auto' (default; the phi-ratio-trained "
                         "pseudo-SDF carries an arbitrary constant "
                         "offset — a measured chip field sat entirely "
                         "in [-0.93, -0.55], so iso=0 extracts nothing) "
                         "or a number for the reference's fixed level")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    import quality_matrix as qm

    from human_body_reconstruction_tpu.ops import dense_grid
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.pipeline import mesh_export
    from human_body_reconstruction_tpu.train import checkpoint
    from human_body_reconstruction_tpu.utils import config as C

    H = W = 400
    K, train_poses, _, _, _ = qm.load_or_render_gt(H, W, 20,
                                                   scene=args.scene)
    lo, hi = rays_lib.scene_bounds(H, W, K, jnp.asarray(train_poses),
                                   2.0, 6.0)
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}

    import jax

    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.ops import hash_encoding as he

    cfg = qm.make_modes(C, dense_grid)[args.mode]
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    template = {
        **he.init_encoder(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    if cfg.render.use_sdf:
        template["var"] = mlp_lib.init_var_model()
    params, _ = checkpoint.load_pytree(
        args.params or f"qm_params_{args.mode}.npz", template)
    out = args.out or f"sdf_mesh_{args.scene}_r4.ply"
    try:
        iso = float(args.iso)
    except ValueError:
        iso = args.iso
    stats = mesh_export.export_mesh(params, scene, cfg,
                                    resolution=args.resolution, iso=iso,
                                    out_path=out)
    row_iso = {"iso_requested": args.iso}
    row = {k: stats[k] for k in ("num_verts", "num_faces", "sweep_seconds",
                                 "marching_seconds", "out_path")}
    row.update(scene=args.scene, mode=args.mode,
               resolution=args.resolution, **row_iso)
    print(json.dumps(row), flush=True)
    with open(f"sdf_mesh_{args.scene}_r4.json", "w") as f:
        f.write(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
