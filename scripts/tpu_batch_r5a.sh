#!/bin/bash
# Round-5 chip batch A: the evidence ladder VERDICT r4 ordered.
#   0. GT caches for every scene this batch touches, in one warm process
#   1. SDF xla+es16k textured  (VERDICT missing #1 — the safe shot)
#   2. hierarchical XLA        (VERDICT missing #2)
#   3. n1024 quality gates     (the sum_G-cut 300k candidate, r25+r50)
#   4. held-back tangle seed 101 at 240 s AND 720 s (fresh seed +
#      budget-scaling row, VERDICT item 6)
#   5. SDF xla+es16k humanoid  (second scene family)
#   6. serving steady state    (VERDICT item 4)
#   7. SDF pallas+es16k        (known helper-crash risk — LAST)
#   8. SDF -> marching-tetrahedra mesh artifacts from whatever landed
# Every qm unit runs under --isolate (own subprocess + wall deadline,
# VERDICT item 5), so a helper crash cannot poison the rest.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
QM="python scripts/quality_matrix.py --isolate --budget 240"

timeout 7200 python scripts/tpu_gt_prep.py \
  --scenes textured,humanoid,tangle:101 2>&1 | tail -8

timeout 2400 $QM --out qm_r5_sdf_xla_textured.json --save_params \
  --unit_timeout 2100 \
  --modes cp_r21_sdf_guided_xla_es16k 2>&1 | tail -6

timeout 2400 $QM --out qm_r5_hier.json --unit_timeout 2100 \
  --modes cp_r21_hier_xla 2>&1 | tail -6

timeout 4800 $QM --out qm_r5_n1024.json --unit_timeout 2100 \
  --modes cp_n1024_r25_guided_k32_p32_tv1e2_strat,cp_n1024_r50_guided_k32_p32_tv1e2_strat \
  2>&1 | tail -8

timeout 2400 $QM --out qm_r5_heldback_240.json --unit_timeout 2100 \
  --scene tangle --scene_seed 101 \
  --modes cp_r21_guided_k32_p32_tv1e2_strat 2>&1 | tail -6

timeout 3300 python scripts/quality_matrix.py --isolate --budget 720 \
  --out qm_r5_heldback_720.json --unit_timeout 3000 \
  --scene tangle --scene_seed 101 \
  --modes cp_r21_guided_k32_p32_tv1e2_strat 2>&1 | tail -6

timeout 2400 $QM --out qm_r5_sdf_xla_humanoid.json --unit_timeout 2100 \
  --scene humanoid \
  --modes cp_r21_sdf_guided_xla_es16k 2>&1 | tail -6

SERVING_OUT=serving_r5.json timeout 1800 \
  python scripts/tpu_serving_r4.py 2>&1 | tail -20

# known helper-crash risk: last, isolated, 1 attempt per try but the
# subprocess harness still gives it the full deadline
timeout 2400 $QM --out qm_r5_sdf_pallas_textured.json --save_params \
  --unit_timeout 2100 --attempts 2 \
  --modes cp_r21_sdf_guided_es16k 2>&1 | tail -6

timeout 900 python scripts/tpu_sdf_mesh_r4.py \
  --mode cp_r21_sdf_guided_xla_es16k --resolution 192 2>&1 | tail -6
timeout 900 python scripts/tpu_sdf_mesh_r4.py \
  --mode cp_r21_sdf_guided_es16k --resolution 192 2>&1 | tail -6

echo BATCH_R5A_DONE
