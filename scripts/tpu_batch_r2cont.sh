#!/bin/bash
# Round-2 continuation batch (fresh machine: /tmp and results/ were
# wiped, so GT caches, AOT caches and the flagship checkpoint must be
# regenerated).  Serial, one process per experiment (CLAUDE.md
# host-contention rule).  Stages are independent: a TPU-worker crash in
# one must not sink the rest.
#
#   1. warm-cache speedrun (A populate + B timed)  — the "<10 min wall
#      to 30 dB" north-star artifact (scripts/tpu_batch_speedrun_warm.sh)
#   2. flagship checkpoint regen (2500 steps, fused 25-step dispatch)
#   3. serving A/B on the holdout view: exact 128-ladder vs the NEW
#      deterministic --eval_guided placement (48 and 32 budgets),
#      PSNR vs GT + warm rays/s for each
#   4. bench.py (records the scan8 fused-dispatch headline)
#   5. granular step profile at the K=32 headline operating point
#
# Usage: bash scripts/tpu_batch_r2cont.sh >> /tmp/tpu_r2cont.log 2>&1
set -x
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo

# 1. warm speedrun (writes speedrun_30db_warm.json)
bash scripts/tpu_batch_speedrun_warm.sh
echo "=== speedrun_warm rc=$?"

# 2. flagship checkpoint (serving + mesh subject for later stages)
timeout 4500 python -m human_body_reconstruction_tpu.cli.train_hash \
    --synthetic --synthetic_subject textured \
    --num_batch 16384 --num_samples 128 \
    --stochastic --packed --pack_format int8 --grad_subsample --hw_rng \
    --num_levels 8 --features_per_level 4 --dense_levels -1 \
    --occupancy --occ_guided --compact 32 --occ_probes 64 \
    --steps 2500 --steps_per_call 25 --log_every 250 --eval_every 2500 \
    --aot_cache /tmp/hbr_aot_flag \
    --write --model_name flagship --out_dir results/r2c_flagship
echo "=== flagship_train rc=$?"

# 3. serving A/B: exact ladder vs deterministic guided placement.
#    Same process, each mode timed on its SECOND render (warm, honest
#    time-adjacent comparison; chip rate drifts across hours).
timeout 3000 python - <<'EOF'
import json, sys, time
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, "scripts")
from quality_matrix import load_or_render_gt
from human_body_reconstruction_tpu.pipeline import restore
from human_body_reconstruction_tpu.train import step as step_lib
import dataclasses

H = W = 400
K, poses, imgs = load_or_render_gt(H, W, 20)
hold_img, hold_pose = imgs[20], jnp.asarray(poses[20])
res = restore.restore("results/r2c_flagship", "flagship",
                      bound_pth="results/r2c_flagship/bounds_model.npy",
                      with_occ=True)
assert res.occ is not None

def run(cfg, tag, n_samples):
    def once():
        t0 = time.perf_counter()
        img = step_lib.render_image(res.params, res.scene, H, W, K,
                                    hold_pose, cfg, occ=res.occ,
                                    num_samples=n_samples, chunk=32768)
        return img, time.perf_counter() - t0
    img, cold = once()
    img, warm = once()
    mse = float(np.mean((img - hold_img) ** 2))
    db = 10 * np.log10(1.0 / max(mse, 1e-12))
    return {"mode": tag, "psnr_db": round(db, 2),
            "cold_s": round(cold, 1), "warm_s": round(warm, 1),
            "warm_rays_per_s": round(H * W / warm, 1)}

rows = []
rows.append(run(res.cfg, "exact128", 128))
for k in (48, 32):
    cfg_g = dataclasses.replace(
        res.cfg, render=dataclasses.replace(res.cfg.render, eval_guided=k))
    rows.append(run(cfg_g, f"guided{k}_probes128", 128))
print("SERVING_AB " + json.dumps(rows))
with open("serving_ab.json", "w") as f:
    json.dump(rows, f, indent=1)
EOF
echo "=== serving_ab rc=$?"

# 4. bench (captures the scan8 fused headline)
timeout 6000 python bench.py
echo "=== bench rc=$?"

# 5. granular profile at the headline operating point
PROF_K=32 timeout 3000 python scripts/tpu_profile_step.py
echo "=== profile rc=$?"
