"""Isolate the SDF train-step remote-compile crash (round 4).

qm_r4_sdf_{textured,humanoid}.json: every SDF mode fails compile with
"tpu_compile_helper subprocess exit code 1" (all ports), while non-SDF
flagship steps and GT renders compile fine in the same windows.  The
SDF step's HLO is the only one carrying MULTIPLE Pallas encoder
instances (render pass + the 6-offset eikonal eval) and their
backwards — suspicion: the helper dies (OOM?) on modules with many
Mosaic kernels, or on one of the Pallas backwards at eikonal batch
shapes.

Ladder (tiny B=2048, K=16 — compile cost only):
  xla_xla        cp_impl=xla, dense_impl=xla  (no Pallas at all)
  pallas_xla     cp Pallas, dense XLA
  xla_pallas     cp XLA, dense Pallas
  pallas_pallas  both (the failing qm config, expected to crash)
  pallas_noeik   both Pallas, eikonal_weight=0 (does dropping the
                 second encoder instance fix it?)

Each case: jit the REAL train_step, one step, catch + record.  Writes
sdf_isolate_r4.json incrementally.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_sdf_isolate.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp


def main():
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
    B = 2048
    ds = synthetic.make_dataset(n_views=4, H=64, W=64)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"],
                                   ds["c2ws"], ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    occ = occupancy.init_grid(64, threshold=0.01)
    occ = occupancy.update(occ, lambda p: synthetic.blob_field(p)[1],
                           jax.random.PRNGKey(0), scene["mu"],
                           scene["sigma"], num_cells=64 ** 3)

    results = {}

    def case(name, cp_impl, dense_impl, eik_weight=1e-2):
        hcfg = C.HashConfig(num_levels=8, n_min=16, n_max=2048,
                            variant="cp", cp_rank=21, cp_impl=cp_impl,
                            dense_impl=dense_impl)
        hcfg = dataclasses.replace(
            hcfg, dense_levels=dense_grid.auto_dense_levels(hcfg))
        cfg = C.PipelineConfig(
            hash=hcfg,
            mlp=C.MLPConfig(density_activation="sdf"),
            render=C.RenderConfig(num_samples=64, occupancy=True,
                                  occupancy_resolution=64,
                                  compact_samples=16, occ_guided=True,
                                  occ_probes=32, occ_dt="mass",
                                  occ_stratified=True, use_sdf=True),
            train=C.TrainConfig(ray_batch=B, cp_tv_weight=1e-2,
                                eikonal_weight=eik_weight))
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {**he.init_encoder(k1, cfg.hash),
                  "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                            cfg.dir_enc.out_dim),
                  "var": mlp_lib.init_var_model()}
        state, tx = state_lib.create_train_state(params, cfg.train, 100,
                                                 occ=occ)
        t0 = time.time()
        try:
            state2, m = step_lib.train_step(
                state, scene, ds["images"], ds["c2ws"], ds["K"],
                jax.random.PRNGKey(1), cfg, tx, B)
            loss = float(m["loss"])
            results[name] = {"ok": True, "loss": round(loss, 4),
                             "compile_s": round(time.time() - t0, 1)}
        except Exception as e:
            results[name] = {"ok": False, "error": repr(e)[:300],
                             "compile_s": round(time.time() - t0, 1)}
        print(name, results[name], flush=True)
        with open("sdf_isolate_r4.json", "w") as f:
            f.write(json.dumps(results, indent=1))

    case("xla_xla", "xla", "xla")
    case("pallas_xla", "pallas", "xla")
    case("xla_pallas", "xla", "pallas")
    case("pallas_noeik", "pallas", "pallas", eik_weight=0.0)
    case("pallas_pallas", "pallas", "pallas")


if __name__ == "__main__":
    main()
