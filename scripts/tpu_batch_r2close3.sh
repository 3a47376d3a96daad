#!/bin/bash
# Round-2 close, third TPU batch: resume the stages the second batch
# never finished (it died inside the first mesh export — the known
# remote-TPU worker crash).  Stage 1 (flagship 2500-step train) already
# completed: results/r2_flagship_k32m, 29.70 dB eval, 203k rays/s
# sustained with --steps_per_call 25.  Serial, one process per
# experiment (CLAUDE.md contention rule).
# Usage: bash scripts/tpu_batch_r2close3.sh >> /tmp/tpu_r2close3.log 2>&1
set -x
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo

# 1. warm-path mesh export timing (two exports in one process: the
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

# 2. mesh export in a FRESH process with the warmed AOT cache: the
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

# 3. serving path: novel-view render CLI from the flagship checkpoint.
#    Two orbits in one process (cold compile + warm), trained-occupancy
#    culling on, AOT cache written for stage 4.
timeout 3000 python - <<'EOF'
import time, json
from human_body_reconstruction_tpu.cli import render
base = ["--ckpt_dir", "results/r2_flagship_k32m",
        "--model_name", "flagship_k32m",
        "--bound_pth", "results/r2_flagship_k32m/bounds_model.npy",
        "--height", "400", "--width", "400", "--num_samples", "128",
        "--chunk", "16384", "--use_occ",
        "--aot_cache", "/tmp/hbr_aot_render"]
t0 = time.perf_counter()
s1 = render.main(base + ["--orbit", "2", "--out_dir", "/tmp/serve_cold"])
t1 = time.perf_counter()
s2 = render.main(base + ["--orbit", "4", "--out_dir", "/tmp/serve_warm"])
t2 = time.perf_counter()
print(json.dumps({"serve_cold_s": round(t1 - t0, 1),
                  "serve_warm_s": round(t2 - t1, 1),
                  "serve_warm_rays_per_s": s2["rays_per_sec"]}))
EOF
echo "=== serve rc=$?"

# 4. serving in a FRESH process with the warmed AOT cache
timeout 1800 python - <<'EOF'
import time, json
from human_body_reconstruction_tpu.cli import render
t0 = time.perf_counter()
s = render.main(["--ckpt_dir", "results/r2_flagship_k32m",
                 "--model_name", "flagship_k32m",
                 "--bound_pth", "results/r2_flagship_k32m/bounds_model.npy",
                 "--height", "400", "--width", "400",
                 "--num_samples", "128", "--chunk", "16384", "--use_occ",
                 "--aot_cache", "/tmp/hbr_aot_render",
                 "--orbit", "4", "--out_dir", "/tmp/serve_aot"])
print(json.dumps({"serve_fresh_process_aot_s": round(time.perf_counter() - t0, 1),
                  "serve_aot_rays_per_s": s["rays_per_sec"]}))
EOF
echo "=== serve_aot rc=$?"

# 5. bench (gives the driver-comparable number)
timeout 4000 python bench.py
echo "=== bench rc=$?"
