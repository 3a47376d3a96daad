#!/bin/bash
# Round-4 quality batch A (chip-serial; run AFTER the micro-profile):
#  1. SDF mode on-chip quality evidence (VERDICT r3 missing #1) on both
#     scene families + params saved for the SDF->mesh export
#  2. hierarchical coarse+fine on-chip (VERDICT r3 missing #2)
#  3. K=24 / probes-32 operating points (step_ablate_r4.json: -35 ms /
#     -7 ms per step) — do they hold the >=33 dB textured bar?
#  4. held-back tangle scene, seed 100, flagship mode only (one-shot)
# Each mode: 240 s budget, 4-pose holdout, same protocol as round 3.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

python scripts/quality_matrix.py --budget 240 --out qm_r4_sdf_textured.json \
  --save_params \
  --modes cp_r21_sdf_guided_k32_tv1e2_strat,cp_r21_sdf_plain \
  2>&1 | tail -20

python scripts/quality_matrix.py --budget 240 --out qm_r4_sdf_humanoid.json \
  --scene humanoid --save_params \
  --modes cp_r21_sdf_guided_k32_tv1e2_strat \
  2>&1 | tail -12

python scripts/quality_matrix.py --budget 240 --out qm_r4_hier.json \
  --modes cp_r21_hier_64f64_tv1e2 \
  2>&1 | tail -12

python scripts/quality_matrix.py --budget 240 --out qm_r4_kprobe.json \
  --modes cp_r21_guided_k24_tv1e2_strat,cp_r21_guided_k32_p32_tv1e2_strat,cp_r21_guided_k24_p32_tv1e2_strat \
  2>&1 | tail -16

python scripts/quality_matrix.py --budget 240 --out qm_r4_heldback.json \
  --scene tangle --scene_seed 100 \
  --modes cp_r21_guided_k32_tv1e2_strat \
  2>&1 | tail -12

echo BATCH_DONE
