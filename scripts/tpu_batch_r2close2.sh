#!/bin/bash
# Round-2 close, second TPU batch: the items the first r2close batch
# never reached (it was interrupted after qm_g256).  Serial, one
# process per experiment (CLAUDE.md contention rule).
# Usage: bash scripts/tpu_batch_r2close2.sh >> /tmp/tpu_r2close2.log 2>&1
set -x
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo

# 1. regenerate the flagship checkpoint through the full Trainer path.
#    2500 steps: unbiased mass-dt (now default) crosses 30 dB at ~2000
#    (speedrun + quality matrix), so this also revalidates the 30-dB
#    CLI number at less than half the old 6000-step budget.  Fused
#    25-step dispatch exercises the Trainer steps_per_call path on TPU.
timeout 4500 python -m human_body_reconstruction_tpu.cli.train_hash \
    --synthetic --synthetic_subject textured \
    --num_batch 16384 --num_samples 128 \
    --stochastic --packed --pack_format int8 --grad_subsample --hw_rng \
    --num_levels 8 --features_per_level 4 --dense_levels -1 \
    --occupancy --occ_guided --compact 32 --occ_probes 64 \
    --steps 2500 --steps_per_call 25 --log_every 250 --eval_every 2500 \
    --write --model_name flagship_k32m --out_dir results/r2_flagship_k32m
echo "=== flagship_train rc=$?"

# 2. warm-path mesh export timing (two exports in one process: the
#    second reuses the compiled sweep executable)
timeout 3000 python - <<'EOF'
import time, json
from human_body_reconstruction_tpu.cli import nerf2mesh
base = ["--ckpt_dir", "results/r2_flagship_k32m",
        "--model_name", "flagship_k32m",
        "--bound_pth", "bounds_model.npy",
        "--resolution", "256", "--iso", "5.0",
        "--cache", "",          # no density cache: time the real sweep
        "--aot_cache", "/tmp/hbr_aot_mesh"]   # writes the executable
t0 = time.perf_counter()
nerf2mesh.main(base + ["--out", "/tmp/mesh_warm1.ply"])
t1 = time.perf_counter()
nerf2mesh.main(base + ["--out", "/tmp/mesh_warm2.ply"])
t2 = time.perf_counter()
print(json.dumps({"cold_s": round(t1 - t0, 1),
                  "warm_s": round(t2 - t1, 1)}))
EOF
echo "=== mesh rc=$?"

# 3. mesh export in a FRESH process with the warmed AOT cache: the
#    cross-process no-compile path (the reason utils/aot.py exists)
timeout 1800 python - <<'EOF'
import time, json
from human_body_reconstruction_tpu.cli import nerf2mesh
t0 = time.perf_counter()
nerf2mesh.main(["--ckpt_dir", "results/r2_flagship_k32m",
                "--model_name", "flagship_k32m",
                "--bound_pth", "bounds_model.npy",
                "--resolution", "256", "--iso", "5.0", "--cache", "",
                "--aot_cache", "/tmp/hbr_aot_mesh",
                "--out", "/tmp/mesh_aot.ply"])
print(json.dumps({"fresh_process_aot_s": round(time.perf_counter() - t0, 1)}))
EOF
echo "=== mesh_aot rc=$?"

# 4. bench with the scan8 mode (gives the driver-comparable number)
timeout 4000 python bench.py
echo "=== bench rc=$?"
