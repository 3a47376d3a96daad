#!/bin/bash
# Round-2 close TPU batch: run everything pending in one serial pass
# (one process per experiment; never overlap — CLAUDE.md contention rule).
# Usage: bash scripts/tpu_batch_r2close.sh >> /tmp/tpu_batch.log 2>&1
set -x
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo

# 0. does the axon PJRT plugin support executable serialization?
#    (tiny HLO: one cheap remote compile either way)
timeout 1200 python - <<'EOF'
import json, time
import jax, jax.numpy as jnp
from human_body_reconstruction_tpu.utils import aot
cache = aot.AOTCache("/tmp/hbr_aot_probe")
f = aot.CachedJit(jax.jit(lambda x: jnp.sin(x) * 2.0 + 1.0), cache)
t0 = time.time(); float(f(jnp.arange(37.0))[0]); t1 = time.time()
c2 = aot.AOTCache("/tmp/hbr_aot_probe")
g = aot.CachedJit(jax.jit(lambda x: jnp.sin(x) * 2.0 + 1.0), c2)
t2 = time.time(); float(g(jnp.arange(37.0))[0]); t3 = time.time()
print(json.dumps({"aot_probe": {"first_s": round(t1-t0, 2),
                                "reload_s": round(t3-t2, 2),
                                "wrote": cache.misses == 1 and not cache._write_broken,
                                "hit": c2.hits == 1}}))
EOF
echo "=== aot_probe rc=$?"

# 1. speedrun: wall-clock to 30 dB at the flagship operating point
timeout 5400 python scripts/speedrun_30db.py --out speedrun_30db.json
echo "=== speedrun rc=$?"

# 2. 256-cell occupancy grid A/B at the 240s matrix budget
timeout 2400 python scripts/quality_matrix.py --budget 240 \
    --modes int8_dense_guided_k32_mass_g256 --out qm_g256.json
echo "=== qm_g256 rc=$?"

# 3. regenerate the flagship checkpoint (fresh machine: results/ is not
#    committed).  Full Trainer-path 6000-step run at the headline
#    operating point — also revalidates the 30-dB CLI number.
timeout 5400 python -m human_body_reconstruction_tpu.cli.train_hash \
    --synthetic --synthetic_subject textured \
    --num_batch 16384 --num_samples 128 \
    --stochastic --packed --pack_format int8 --grad_subsample --hw_rng \
    --num_levels 8 --features_per_level 4 --dense_levels -1 \
    --occupancy --occ_guided --compact 32 --occ_probes 64 \
    --steps 6000 --log_every 250 --eval_every 3000 --write \
    --model_name flagship_k32m --out_dir results/r2_flagship_k32m
echo "=== flagship_train rc=$?"

# 4. warm-path mesh export timing (two exports in one process: the
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

# 4b. mesh export in a FRESH process with the warmed AOT cache: the
#     cross-process no-compile path (the reason utils/aot.py exists)
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

# 5. bench with the updated modes (gives the driver-comparable number)
timeout 4000 python bench.py
echo "=== bench rc=$?"
